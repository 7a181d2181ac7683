package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.collection.immutable.VectorMap
import graft.spec.{Accounts, Acl}

/** Store-level pins for the auth overlay (ROADMAP auth + sharing blocks):
  * salted PBKDF2 verification, JSON round-trips, the permission model's
  * legacy/no-ACL behavior, and atomic audit-id allocation. The HTTP-level
  * flow lives in DashboardSpec D7. */
class AccountsSpec extends AnyFunSuite {

  test("password hashing: salted PBKDF2 verifies and rejects") {
    val u = Accounts.makeUser("user_1", "alice", "s3cret")
    assert(Accounts.verify(u, "s3cret"))
    assert(!Accounts.verify(u, "s3cret "))
    assert(!Accounts.verify(u, ""))
    // same password, fresh salt → different hash (no rainbow reuse)
    val u2 = Accounts.makeUser("user_2", "bob", "s3cret")
    assert(u2.passwordHash != u.passwordHash)
  }

  test("users and acls round-trip through their JSON stores") {
    val dir = Files.createTempDirectory("accounts")
    val up = dir.resolve("users.json").toString
    val ap = dir.resolve("acl.json").toString
    val u = Accounts.makeUser("user_1", "alice", "pw")
    Accounts.upsertUser(up, u)
    assert(Accounts.loadUsers(up) == Map("user_1" -> u))
    val a = Acl("alice", "private", VectorMap("bob" -> "view", "eve" -> "edit"))
    Accounts.upsertAcl(ap, "m1", a)
    assert(Accounts.loadAcls(ap) == Map("m1" -> a))
    Accounts.deleteAcl(ap, "m1")
    assert(Accounts.loadAcls(ap).isEmpty)
  }

  test("permission model: no-ACL legacy, private, public, shares, owner") {
    val acls = Map(
      "priv" -> Acl("alice", "private", VectorMap("bob" -> "view")),
      "pub"  -> Acl("alice", "public", VectorMap.empty),
      "ed"   -> Acl("alice", "private", VectorMap("bob" -> "edit")))
    // legacy resource (no entry): visible to all, editable by any login
    assert(Accounts.canView(acls, "legacy", None))
    assert(!Accounts.canEdit(acls, "legacy", None))
    assert(Accounts.canEdit(acls, "legacy", Some("bob")))
    // private: owner + sharee only; view share does not grant edit
    assert(Accounts.canView(acls, "priv", Some("alice")))
    assert(Accounts.canView(acls, "priv", Some("bob")))
    assert(!Accounts.canView(acls, "priv", Some("eve")))
    assert(!Accounts.canView(acls, "priv", None))
    assert(!Accounts.canEdit(acls, "priv", Some("bob")))
    // edit share grants edit but not ownership
    assert(Accounts.canEdit(acls, "ed", Some("bob")))
    assert(!Accounts.isOwner(acls, "ed", Some("bob")))
    assert(Accounts.isOwner(acls, "ed", Some("alice")))
    // public: everyone views, only owner/edit-sharee edits
    assert(Accounts.canView(acls, "pub", Some("eve")))
    assert(!Accounts.canEdit(acls, "pub", Some("eve")))
  }

  test("audit ids allocate atomically under concurrent appends") {
    val path = Files.createTempDirectory("audit").resolve("audit.json").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 24).map { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            Accounts.appendAudit(path, s"u$i", "login", s"r$i", "t0")
        })
      }
      tasks.foreach(_.get())
      val es = Accounts.loadAudit(path)
      assert(es.size == 24 && es.keySet == (1 to 24).map(i => s"ev_$i").toSet)
    } finally pool.shutdown()
  }
}
