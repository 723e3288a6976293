package graft.storage

/** The reference's `sydradb.toml` config surface
  * (`/root/reference/src/sydra/config.zig:35-98`): a line-oriented
  * key = value subset of TOML (no sections; `#` comments; quoted or bare
  * strings), with `retention.<ns> = days` namespace TTL overrides.
  *
  * Engine-tuning keys that have no Spark meaning (memtable bytes, fsync
  * policy, mem limit) are parsed and carried for fidelity — `Ingest`
  * micro-batching and parquet durability replace their mechanisms.
  */
final case class Config(
    dataDir: String = "./data",
    httpPort: Int = 8080,
    fsync: String = "interval", // always | interval | none
    flushIntervalMs: Int = 2000,
    memtableMaxBytes: Long = 8L * 1024 * 1024,
    retentionDays: Long = 0, // 0 = keep forever
    authToken: String = "",
    enableInflux: Boolean = false,
    enableProm: Boolean = true,
    memLimitBytes: Long = 256L * 1024 * 1024,
    retentionNs: Map[String, Long] = Map.empty) {

  /** TTL days for a series: namespace override, else the global default
    * (`config.zig:101-105`).
    */
  def ttlForSeries(series: String): Long =
    retentionNs.getOrElse(Config.namespaceOf(series), retentionDays)
}

object Config {

  /** Series namespace = prefix before the first '.', whole name if none
    * (`config.zig:96-99`).
    */
  def namespaceOf(series: String): String = {
    val i = series.indexOf('.')
    if (i >= 0) series.substring(0, i) else series
  }

  def parse(text: String): Config = {
    var cfg = Config()
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val eq = line.indexOf('=')
        if (eq >= 0) {
          val key = line.substring(0, eq).trim
          val rawVal = line.substring(eq + 1).trim
          def unquoted: String =
            if (rawVal.length >= 2 && rawVal.head == '"' && rawVal.last == '"')
              rawVal.substring(1, rawVal.length - 1)
            else rawVal
          key match {
            case "data_dir" =>
              // reference only honors the quoted form here (config.zig:56-61)
              if (rawVal.length >= 2 && rawVal.head == '"' && rawVal.last == '"')
                cfg = cfg.copy(dataDir = rawVal.substring(1, rawVal.length - 1))
            case "http_port" => cfg = cfg.copy(httpPort = rawVal.toInt)
            case "flush_interval_ms" => cfg = cfg.copy(flushIntervalMs = rawVal.toInt)
            case "memtable_max_bytes" => cfg = cfg.copy(memtableMaxBytes = rawVal.toLong)
            case "retention_days" => cfg = cfg.copy(retentionDays = rawVal.toLong)
            case "fsync" =>
              if (Set("always", "interval", "none")(unquoted)) cfg = cfg.copy(fsync = unquoted)
            case "mem_limit_bytes" => cfg = cfg.copy(memLimitBytes = rawVal.toLong)
            case "auth_token" => cfg = cfg.copy(authToken = unquoted)
            case "enable_influx" => cfg = cfg.copy(enableInflux = rawVal == "true")
            case "enable_prom" => cfg = cfg.copy(enableProm = rawVal == "true")
            case k if k.startsWith("retention.") =>
              cfg = cfg.copy(retentionNs =
                cfg.retentionNs + (k.substring("retention.".length) -> rawVal.toLong))
            case _ => () // unknown keys ignored, like the reference
          }
        }
      }
    }
    cfg
  }

  /** `config.load`: parse `sydradb.toml` from `path`, defaults when the
    * file is missing (`server.zig:34-48`).
    */
  def loadOrDefault(path: String = "sydradb.toml"): Config = {
    val f = new java.io.File(path)
    if (f.exists()) parse(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    else Config()
  }
}
