package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.collection.immutable.VectorMap
import graft.spec._

/** k32 — connection specs in the store: env-reference templates, secret
  * redaction on write (a literal secret never reaches connections.json),
  * and byte round-trips matching the store's json.dump(indent=2)
  * convention. */
class ConnectionStoreSpec extends AnyFunSuite {

  test("k32: literal secrets are redacted on write; env references pass through") {
    val c = ConnectionSpec(
      id = "pg", name = "warehouse",
      url = "jdbc:postgresql://${PGHOST}:5432/${PGDATABASE}",
      properties = VectorMap(
        "user" -> "etl",
        "password" -> "hunter2",           // literal -> must be redacted
        "ssl" -> "true"))
    val text = SpecJson.dumps(SpecJson.connectionSpecDict(c))
    assert(!text.contains("hunter2"), s"secret leaked to disk:\n$text")
    assert(text.contains(Connections.Redacted))
    assert(text.contains("jdbc:postgresql://${PGHOST}:5432/${PGDATABASE}"))
    // an env-REFERENCE password is not a secret and survives verbatim
    val cRef = c.copy(properties = c.properties + ("password" -> "${PGPASSWORD}"))
    val textRef = SpecJson.dumps(SpecJson.connectionSpecDict(cRef))
    assert(textRef.contains("${PGPASSWORD}") && !textRef.contains(Connections.Redacted))
  }

  test("k32: connections.json byte round-trips; upsert/delete behave like the other stores") {
    val dir = Files.createTempDirectory("connstore")
    val path = dir.resolve("connections.json").toString
    val c = ConnectionSpec(id = "db1", name = "one",
      url = "jdbc:derby:${DB_DIR}/db",
      properties = VectorMap("user" -> "app", "password" -> "${DB_PASSWORD}"))
    SpecStore.upsertConnection(path, c)
    val text = Files.readString(Paths.get(path))
    // load -> save reproduces the bytes (redaction is idempotent)
    SpecStore.saveConnections(path, SpecStore.loadConnections(path))
    assert(Files.readString(Paths.get(path)) == text)
    val loaded = SpecStore.loadConnections(path)("db1")
    assert(loaded == c)
    assert(SpecStore.deleteConnection(path, "db1"))
    assert(!SpecStore.deleteConnection(path, "db1"))
  }

  test("k32: resolution substitutes env references and fails loudly when unset") {
    val c = ConnectionSpec(id = "d", name = "d",
      url = "jdbc:derby:${DB_DIR}/db",
      properties = VectorMap("user" -> "app", "password" -> "${DB_PASSWORD}"))
    val env = Map("DB_DIR" -> "/tmp/x", "DB_PASSWORD" -> "s3cret")
    assert(Connections.resolveUrl(c, env.get) == "jdbc:derby:/tmp/x/db")
    val props = Connections.resolveProperties(c, env.get)
    assert(props.getProperty("password") == "s3cret")
    intercept[IllegalArgumentException](Connections.resolveUrl(c, _ => None))
    // a redacted-on-disk literal can never resolve into a live connection
    val redacted = SpecStore.parseAny(
      SpecJson.dumps(SpecJson.connectionSpecDict(
        c.copy(properties = VectorMap("password" -> "oops-literal")))))
    val dir = Files.createTempDirectory("connstore2")
    val p = dir.resolve("connections.json").toString
    SpecStore.upsertConnection(p,
      c.copy(properties = VectorMap("password" -> "oops-literal")))
    val back = SpecStore.loadConnections(p)("d")
    assert(back.properties("password") == Connections.Redacted)
    intercept[IllegalArgumentException](Connections.resolveProperties(back, env.get))
  }
}
