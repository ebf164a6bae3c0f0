package graft.plans

/** The `provider:` top-level config block: instead of shipping the
  * topology in the bootstrap file, fetch it from an HTTP endpoint and
  * re-poll for changes (reference: src/providers/http.rs — the only
  * provider kind, `enum Providers { Http }` in src/providers/mod.rs).
  *
  * Reference semantics kept exactly:
  *  - the initial fetch is part of the build — an error aborts startup
  *    (`ProviderConfig::build` returns the request error);
  *  - poll-tick errors are SKIPPED, the last good config keeps running
  *    (`poll_http` matches `Err(_) => {}`);
  *  - `request.headers` are attached to every request (auth to private
  *    endpoints);
  *  - `config_format` defaults to toml (config/format.rs `#[default]`);
  *  - `interpolate_env` (default false) runs environment-variable
  *    interpolation over the fetched text;
  *  - `poll_interval_secs` defaults to 30.
  *
  * Each successful poll feeds the same graph-diff reload the `--watch`
  * path uses (ConfigLoader.diffConfigs/reload) — the analog of the
  * reference yielding `SignalTo::ReloadFromConfigBuilder` into the
  * topology's reload-and-respawn loop, which also diffs and no-ops on
  * an unchanged config.
  */
object HttpProvider {
  final case class Config(
      url: String,
      headers: Map[String, String],
      pollIntervalSecs: Long,
      configFormat: String,
      interpolateEnv: Boolean)

  /** Parse the top-level `provider:` block. None when absent; throws
    * on a missing `url` (providers/http.rs: "URL is required for the
    * `http` provider.") or an unknown provider type. The bootstrap
    * text is env-interpolated first — the reference loads it through
    * config::load, so `${VAR:-default}` works in provider fields
    * (e.g. an auth header token).
    */
  def parse(yaml: String): Option[Config] = {
    val conf = ConfigLoader.parseYaml(
      if (yaml.contains("$")) ConfigLoader.interpolateEnv(yaml) else yaml)
    if (!conf.contains("provider")) None
    else {
      val p = conf("provider") match {
        case m: java.util.Map[_, _] =>
          import scala.jdk.CollectionConverters._
          m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
        case m: Map[_, _] =>
          m.map { case (k, v) => String.valueOf(k) -> v }
        case _ => Map.empty[String, Any]
      }
      p.getOrElse("type", "").toString match {
        case "http" => ()
        case other => throw new IllegalArgumentException(
          s"unknown provider type '$other' (only `http` exists — " +
            "src/providers/mod.rs)")
      }
      val url = p.get("url").map(_.toString).getOrElse(
        throw new IllegalArgumentException(
          "URL is required for the `http` provider."))
      val headers = p.get("request").map {
        case m: java.util.Map[_, _] =>
          import scala.jdk.CollectionConverters._
          m.asScala.collectFirst {
            case (k, h: java.util.Map[_, _])
                if String.valueOf(k) == "headers" =>
              h.asScala.map { case (hk, hv) =>
                String.valueOf(hk) -> String.valueOf(hv) }.toMap
          }.getOrElse(Map.empty[String, String])
        case _ => Map.empty[String, String]
      }.getOrElse(Map.empty[String, String])
      Some(Config(
        url, headers,
        p.getOrElse("poll_interval_secs", "30").toString.toLong,
        p.getOrElse("config_format", "toml").toString,
        p.getOrElse("interpolate_env", "false").toString.toBoolean))
    }
  }

  /** One GET against the provider endpoint → topology text as YAML
    * (toml converted through the in-repo reader; json parses through
    * the same snakeyaml loader, JSON ⊂ YAML). Throws on connect
    * failure or a non-2xx status — the caller decides whether that
    * aborts (initial build) or skips the tick (poll loop).
    */
  // One client for the life of the process: each HttpClient owns
  // selector/executor threads reclaimed only at GC, and the poll loop
  // runs every poll_interval_secs.
  private lazy val client = java.net.http.HttpClient.newHttpClient()

  def fetch(cfg: Config): String = {
    val b = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(cfg.url))
      .timeout(java.time.Duration.ofSeconds(30))
      .GET()
    cfg.headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(
      b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} from ${cfg.url}")
    val asYaml = cfg.configFormat match {
      case "toml" => Toml.toYaml(resp.body())
      case _ => resp.body()
    }
    // ConfigLoader.load env-interpolates every document it is handed,
    // unconditionally. The reference interpolates a provider-fetched
    // document ONCE when interpolate_env is set and NOT AT ALL
    // otherwise (providers/http.rs), so: with the flag on, hand the
    // text through untouched and let the loader's single pass do the
    // work; with the flag off, escape `$` → `$$` so the loader's pass
    // collapses the escapes and restores the document byte-identically
    // (a bare $VAR stays literal instead of being fatal, and a
    // document's own `$$` survives: each `$` doubles, pairs collapse).
    if (cfg.interpolateEnv) asYaml
    else asYaml.replace("$", "$$")
  }
}
