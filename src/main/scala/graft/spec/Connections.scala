package graft.spec

import scala.util.matching.Regex

/** Resolution of ConnectionSpec env references — the k32 leg of the
  * reference's planned database features: connection strings live in the
  * spec store as TEMPLATES (`jdbc:postgresql://${PGHOST}/${PGDATABASE}`),
  * secrets stay in the environment, and resolution happens at use time.
  *
  * `env` defaults to the process environment; callers may layer a
  * fallback (tests, per-job overrides) with `orElse`. An unset variable
  * fails loudly — a half-substituted URL must never reach a driver.
  */
object Connections {

  private val Ref: Regex = """\$\{([A-Za-z_][A-Za-z0-9_]*)\}""".r

  val Redacted = "***REDACTED***"

  /** Does the value contain an env reference (and therefore carries no
    * literal secret)? */
  def hasRef(s: String): Boolean = Ref.findFirstIn(s).isDefined

  def substitute(s: String, env: String => Option[String] = sys.env.get): String =
    Ref.replaceAllIn(s, m => Regex.quoteReplacement(
      env(m.group(1)).getOrElse(throw new IllegalArgumentException(
        s"connection reference '${m.group(1)}' is not set in the environment"))))

  def resolveUrl(c: ConnectionSpec,
                 env: String => Option[String] = sys.env.get): String = {
    require(c.url.nonEmpty, s"connection '${c.id}' has no url")
    val u = substitute(c.url, env)
    require(!u.contains(Redacted),
      s"connection '${c.id}': url contains a redacted secret — store secrets as $${ENV} references")
    u
  }

  def resolveProperties(c: ConnectionSpec,
                        env: String => Option[String] = sys.env.get): java.util.Properties = {
    val p = new java.util.Properties()
    c.properties.foreach { case (k, v) =>
      val r = substitute(v, env)
      require(r != Redacted,
        s"connection '${c.id}': property '$k' was redacted on write — store it as a $${ENV} reference")
      p.setProperty(k, r)
    }
    p
  }
}
