#!/bin/bash
# Multi-executor gate run: same as tools/run.sh but under
# local-cluster[2,8,4096] — separate executor JVMs force real
# serialization of broadcast codebooks, closures, and kernels (the bug
# class local[N] can't catch). Usage: tools/run_cluster.sh graft.Verify ...
set -e
# SPARK_GRAFT_CLASSES: alternate compiled-classes dir (e.g. a snapshot
# copy, so long stress runs are immune to concurrent recompiles of
# target/ — this runner loads classes lazily).
CLASSES="${SPARK_GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
CP="$CLASSES:/opt/spark/jars/*"
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,8,4096]}"
# storageFraction 0.3 (vs Spark's 0.5): the heavy probes cache a
# re-derivable corpus while running shuffle-heavy joins — a 0.5
# PROTECTED storage region lets the cache starve hash builds/sorts of
# execution memory (measured: "not enough memory to build hash map" at
# 20M cached docs). Cached blocks past the protected region spill to
# disk, which is the right trade for derived data.
# zstd shuffle/spill compression (vs default lz4): a one-job heavy
# chain keeps EVERY stage's shuffle output on disk until the job ends —
# at 20M docs the curation chain's lz4 shuffle files filled a 252 GB
# disk ("No space left on device" spill failures). zstd writes ~60% of
# lz4's bytes for a few % CPU; the standard big-cluster setting.
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.memory=${SPARK_EXECUTOR_MEM:-3g} \
  -Dspark.memory.storageFraction=${SPARK_GRAFT_STORAGE_FRACTION:-0.3} \
  -Dspark.io.compression.codec=${SPARK_GRAFT_IO_CODEC:-zstd} \
  -Dspark.driver.maxResultSize=${SPARK_GRAFT_MAX_RESULT:-4g} \
  -Dspark.executor.extraClassPath="$CLASSES" \
  -cp "$CP" "$@"
