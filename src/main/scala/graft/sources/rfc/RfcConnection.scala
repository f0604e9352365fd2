package graft.sources.rfc

import scala.collection.concurrent.TrieMap

/** Connection settings for the `sap-rfc` source — the five keys the
  * reference resolves from its secret and passes to `Connection(**…)`
  * (`/root/reference/pyrfc_read_table/pyrfc_read_table.py:91-117`;
  * key names documented in the reference `README.md:164-168`).
  *
  * `toString` REDACTS `passwd`, so no log line, plan dump, exception
  * message, or debugger interpolation of the connection object can leak
  * the credential (RfcSourceSpec pins this and sweeps the query plan
  * for the literal). */
final case class RfcConnection(ashost: String, sysnr: String,
                               client: String, user: String,
                               passwd: String) {
  override def toString: String =
    s"RfcConnection(ashost=$ashost, sysnr=$sysnr, client=$client, " +
      s"user=$user, passwd=*****)"
}

/** Pluggable secret resolution — the reference's Secrets Manager
  * `get_secret_value` lookup (`pyrfc_read_table.py:91-109`)
  * generalized to an interface: given a secret id, return the
  * credential map (keys `ashost`/`sysnr`/`client`/`user`/`passwd`,
  * case-insensitive). Implementations load by class name through the
  * `secretsProvider` option; the library ships only the in-memory
  * [[MockRfcSecretsProvider]] — a real deployment supplies its own
  * (vault, env, file) so the engine never depends on a vendor SDK. */
trait RfcSecretsProvider {
  def resolve(secretId: String): Map[String, String]
}

/** Deterministic in-process provider for tests (same process-wide
  * registry pattern as [[MockRfcBackend]]); counts resolutions so the
  * spec can pin the one-lookup-per-read memoization contract. */
class MockRfcSecretsProvider extends RfcSecretsProvider {
  override def resolve(secretId: String): Map[String, String] = {
    MockRfcSecretsProvider.resolves.incrementAndGet()
    MockRfcSecretsProvider.secrets.getOrElse(secretId,
      sys.error(s"mock secrets: no such secret $secretId"))
  }
}

object MockRfcSecretsProvider {
  private val secrets = TrieMap.empty[String, Map[String, String]]
  private[rfc] val resolves = new java.util.concurrent.atomic.AtomicLong
  def register(id: String, value: Map[String, String]): Unit =
    secrets.put(id, value)
  def clear(): Unit = secrets.clear()
}
