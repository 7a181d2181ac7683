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

  test("PBKDF2 work factor: new hashes at 210k, legacy 20k rows still verify") {
    // new registrations carry the current OWASP-grade factor in-row
    val u = Accounts.makeUser("user_1", "alice", "pw")
    assert(u.iterations == 210000)
    // a round-13 store row (no `iterations` field) must keep verifying at
    // the constant it was hashed with — recompute that hash independently
    val salt = "00112233445566778899aabbccddeeff"
    val saltBytes = salt.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val spec = new javax.crypto.spec.PBEKeySpec(
      "legacy-pw".toCharArray, saltBytes, 20000, 256)
    val hash = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded.map("%02x".format(_)).mkString
    val dir = Files.createTempDirectory("accounts-legacy")
    val path = dir.resolve("users.json").toString
    Files.writeString(java.nio.file.Paths.get(path),
      s"""{"user_1": {"id": "user_1", "name": "old", """ +
        s""""password_hash": "$hash", "salt": "$salt"}}""")
    val legacy = Accounts.loadUsers(path)("user_1")
    assert(legacy.iterations == 20000)
    assert(Accounts.verify(legacy, "legacy-pw"))
    assert(!Accounts.verify(legacy, "legacy-pw "))
    // upgraded rows round-trip their factor through the store
    Accounts.upsertUser(path, u)
    assert(Accounts.loadUsers(path)("user_1").iterations == 210000)
  }

  test("team principals: `team:<id>` shares expand to members") {
    val teams = Map(
      "team_1" -> graft.spec.Team("team_1", "eng", "alice", Vector("alice", "bob")))
    val acls = Map(
      "m" -> Acl("carol", "private", VectorMap("team:team_1" -> "view")),
      "e" -> Acl("carol", "private", VectorMap("team:team_1" -> "edit")),
      "g" -> Acl("carol", "private", VectorMap("team:ghost" -> "edit")))
    // members (and the team owner implicitly) get the shared level
    assert(Accounts.canView(acls, teams, "m", Some("bob")))
    assert(!Accounts.canEdit(acls, teams, "m", Some("bob")))
    assert(Accounts.canEdit(acls, teams, "e", Some("bob")))
    // non-members see nothing; a share to an unknown team grants nothing
    assert(!Accounts.canView(acls, teams, "m", Some("eve")))
    assert(!Accounts.canView(acls, teams, "g", Some("bob")))
    // without the team store the share is inert (the 3-arg overload)
    assert(!Accounts.canView(acls, "m", Some("bob")))
  }

  test("team store: atomic create, unique names, member add/remove") {
    val path = Files.createTempDirectory("teams").resolve("teams.json").toString
    val t = Accounts.createTeam(path, "eng", "alice").toOption.get
    assert(t.id == "team_1" && t.members == Vector("alice"))
    assert(Accounts.createTeam(path, "eng", "bob").isLeft) // name conflict
    assert(Accounts.createTeam(path, "ops", "bob").toOption.get.id == "team_2")
    val t2 = Accounts.updateTeamMembers(path, "team_1",
      add = Some("bob"), remove = None).toOption.get
    assert(t2.members == Vector("alice", "bob"))
    // idempotent add, then remove
    assert(Accounts.updateTeamMembers(path, "team_1", Some("bob"), None)
      .toOption.get.members == Vector("alice", "bob"))
    assert(Accounts.updateTeamMembers(path, "team_1", None, Some("bob"))
      .toOption.get.members == Vector("alice"))
    assert(Accounts.updateTeamMembers(path, "ghost", Some("x"), None).isLeft)
    assert(Accounts.loadTeams(path).keySet == Set("team_1", "team_2"))
  }

  test("check-and-claim is atomic: one winner under concurrent creates") {
    val path = Files.createTempDirectory("claim").resolve("acl.json").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = (1 to 16).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            if (Accounts.checkAndClaim(path, "m_new", Some(s"u$i"), exists = false))
              wins.incrementAndGet()
          }
        })
      }
      start.countDown()
      tasks.foreach(_.get())
      // exactly one creator wins; the claimed owner is one of the callers
      assert(wins.get() == 1, s"expected one winner, got ${wins.get()}")
      val owner = Accounts.loadAcls(path)("m_new").owner
      assert(owner.startsWith("u"))
      // the winner (and only the winner) can re-upsert
      assert(Accounts.checkAndClaim(path, "m_new", Some(owner), exists = true))
      assert(!Accounts.checkAndClaim(path, "m_new", Some("intruder"), exists = true))
    } finally pool.shutdown()
  }

  test("lattice property: edit implies view, owner implies all, team " +
      "shares are exactly their member expansion, shares are monotone") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    import graft.spec.Team
    val users = Vector("u1", "u2", "u3", "u4", "u5")
    val genTeams: Gen[Map[String, Team]] = Gen.mapOf(for {
      id <- Gen.oneOf("t1", "t2", "t3")
      owner <- Gen.oneOf(users)
      members <- Gen.someOf(users)
    } yield id -> Team(id, s"name-$id", owner, members.toVector))
    def genAcl(teams: Map[String, Team]): Gen[Acl] = for {
      owner <- Gen.oneOf(users)
      vis <- Gen.oneOf("private", "public")
      principals = users ++ teams.keys.map(id => s"team:$id") :+ "team:ghost"
      shares <- Gen.mapOf(Gen.zip(Gen.oneOf(principals),
        Gen.oneOf("view", "edit")))
    } yield Acl(owner, vis, VectorMap.from(shares))
    val gen = for {
      teams <- genTeams
      acl <- genAcl(teams)
      user <- Gen.oneOf(users.map(Option(_)) :+ None)
    } yield (teams, acl, user)
    val prop = Prop.forAll(gen) { case (teams, acl, user) =>
      val acls = Map("r" -> acl)
      val view = Accounts.canView(acls, teams, "r", user)
      val edit = Accounts.canEdit(acls, teams, "r", user)
      val owner = Accounts.isOwner(acls, "r", user)
      // a team share behaves exactly like direct shares to each member
      // (and the team owner); expansion keeps the FIRST level a user
      // gains, mirroring shareLevels' union semantics
      val expanded = VectorMap.from(acl.shares.toSeq.flatMap {
        case (p, lvl) if p.startsWith("team:") =>
          teams.get(p.stripPrefix("team:")).toSeq
            .flatMap(t => (t.members :+ t.owner).map(_ -> lvl))
        case (p, lvl) => Seq(p -> lvl)
      }.groupBy(_._1).view.mapValues(ls =>
        if (ls.exists(_._2 == "edit")) "edit" else "view").toSeq.sortBy(_._1))
      val flat = Map("r" -> acl.copy(shares = expanded))
      (if (edit) view else true) :| "edit must imply view" &&
      (if (user.contains(acl.owner)) view && edit && owner else true) :|
        "the owner holds every right" &&
      (Accounts.canView(flat, Map.empty, "r", user) == view) :|
        s"team-view expansion parity ($expanded)" &&
      (Accounts.canEdit(flat, Map.empty, "r", user) == edit) :|
        s"team-edit expansion parity ($expanded)" &&
      // monotonicity: granting one more direct share never revokes
      {
        val wider = Map("r" -> acl.copy(shares =
          acl.shares.updated(user.getOrElse("u1"), "edit")))
        (!view || Accounts.canView(wider, teams, "r", user)) &&
          (!edit || Accounts.canEdit(wider, teams, "r", user))
      } :| "adding a share never revokes one"
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(300).withInitialSeed(14L), prop)
    assert(res.passed, res.status.toString)
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
