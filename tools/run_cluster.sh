#!/bin/bash
# Multi-executor gate run: same as tools/run.sh but under
# local-cluster[2,8,4096] — separate executor JVMs force real
# serialization of broadcast codebooks, closures, and kernels (the bug
# class local[N] can't catch). Usage: tools/run_cluster.sh graft.Verify ...
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
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
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.memory=${SPARK_EXECUTOR_MEM:-3g} \
  -Dspark.executor.extraClassPath=/root/repo/target/scala-2.13/classes \
  -cp "$CP" "$@"
