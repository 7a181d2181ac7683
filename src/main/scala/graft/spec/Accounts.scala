package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._
import java.nio.file.{Files, Paths}

/** Local-credential user accounts, resource ACLs, and an append-only audit
  * log — the reference ROADMAP's "Authentication & User Management" and
  * "Permissions & Sharing" blocks (ROADMAP.md:31-37, 55-59), implemented
  * the way everything else in spec/ is: keyed JSON stores with CPython
  * dict-upsert ordering, no network. OAuth providers and password-reset
  * EMAIL stay out of scope (both need egress this environment forbids);
  * local registration/login/sessions, private/public visibility,
  * per-user view/edit shares, and the activity audit log are fully real.
  *
  * Scale shape: users/ACLs/audit rows are control-plane METADATA — one
  * row per user/resource/action, never data-scale. Conversions themselves
  * stay unauthenticated Spark jobs; the Dashboard enforces at its API.
  */
/** `iterations` is stored per-user so the work factor can rise without
  * invalidating existing credentials: legacy rows (no field) verify at the
  * constant they were hashed with; new registrations use the current
  * OWASP-grade factor. */
final case class User(id: String, name: String, passwordHash: String,
                      salt: String, iterations: Int = Accounts.Iterations)

/** `visibility`: "private" (owner + shares only) | "public" (all users).
  * `shares`: principal → "view" | "edit", where a principal is a user name
  * or `team:<id>` (expanded against the team store's member lists). */
final case class Acl(owner: String, visibility: String,
                     shares: VectorMap[String, String])

final case class AuditEvent(id: String, user: String, action: String,
                            resource: String, at: String)

/** A group ACL principal (ROADMAP.md:36 "Organization/team support"):
  * shares addressed to `team:<id>` grant every member the share's level.
  * Membership is by user NAME (the shares' own addressing scheme). */
final case class Team(id: String, name: String, owner: String,
                      members: Vector[String])

object Accounts {
  private val mapper = new ObjectMapper()

  // ---- password hashing: PBKDF2-HMAC-SHA256, salted (stdlib only) ------
  /** Current work factor for NEW hashes (OWASP ≥210k for HMAC-SHA256);
    * rows hashed under the previous constant verify via their stored
    * per-user iteration count. */
  private[spec] val Iterations = 210000
  /** The pre-round-14 constant legacy rows (no `iterations` field) were
    * hashed with. */
  private val LegacyIterations = 20000

  private def pbkdf2(password: String, saltHex: String, iterations: Int): String = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, hexBytes(saltHex), iterations, 256)
    val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    hex(f.generateSecret(spec).getEncoded)
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def newSalt(): String = {
    val b = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(b)
    hex(b)
  }

  def makeUser(id: String, name: String, password: String): User = {
    val salt = newSalt()
    User(id, name, pbkdf2(password, salt, Iterations), salt, Iterations)
  }

  def verify(u: User, password: String): Boolean =
    java.security.MessageDigest.isEqual(
      u.passwordHash.getBytes, pbkdf2(password, u.salt, u.iterations).getBytes)

  // ---- stores -----------------------------------------------------------
  private def readKeyed[T](path: String, f: JsonNode => T): Map[String, T] = {
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    VectorMap.from(root.properties.iterator.asScala.map(e => e.getKey -> f(e.getValue)))
  }

  private def text(n: JsonNode, k: String): String =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText).getOrElse("")

  private def user(n: JsonNode): User =
    User(text(n, "id"), text(n, "name"), text(n, "password_hash"), text(n, "salt"),
      iterations = Option(n.get("iterations")).filterNot(_.isNull)
        .map(_.asInt).getOrElse(LegacyIterations))

  private def acl(n: JsonNode): Acl = Acl(
    owner = text(n, "owner"),
    visibility = text(n, "visibility"),
    shares = Option(n.get("shares")).filterNot(_.isNull)
      .map(s => VectorMap.from(s.properties.iterator.asScala
        .map(e => e.getKey -> e.getValue.asText)))
      .getOrElse(VectorMap.empty))

  private def auditEvent(n: JsonNode): AuditEvent = AuditEvent(
    text(n, "id"), text(n, "user"), text(n, "action"),
    text(n, "resource"), text(n, "at"))

  private def team(n: JsonNode): Team = Team(
    text(n, "id"), text(n, "name"), text(n, "owner"),
    members = Option(n.get("members")).filterNot(_.isNull)
      .map(_.elements.asScala.map(_.asText).toVector).getOrElse(Vector.empty))

  private def settings(n: JsonNode): VectorMap[String, String] =
    VectorMap.from(n.properties.iterator.asScala
      .map(e => e.getKey -> e.getValue.asText))

  def loadUsers(path: String): Map[String, User] =
    if (Files.exists(Paths.get(path))) readKeyed(path, user) else VectorMap.empty
  def loadAcls(path: String): Map[String, Acl] =
    if (Files.exists(Paths.get(path))) readKeyed(path, acl) else VectorMap.empty
  def loadAudit(path: String): Map[String, AuditEvent] =
    if (Files.exists(Paths.get(path))) readKeyed(path, auditEvent) else VectorMap.empty
  def loadTeams(path: String): Map[String, Team] =
    if (Files.exists(Paths.get(path))) readKeyed(path, team) else VectorMap.empty
  def loadProfiles(path: String): Map[String, VectorMap[String, String]] =
    if (Files.exists(Paths.get(path))) readKeyed(path, settings) else VectorMap.empty

  private def userDict(u: User) = VectorMap[String, Any](
    "id" -> u.id, "name" -> u.name,
    "password_hash" -> u.passwordHash, "salt" -> u.salt,
    "iterations" -> u.iterations.toLong)
  private def aclDict(a: Acl) = VectorMap[String, Any](
    "owner" -> a.owner, "visibility" -> a.visibility, "shares" -> a.shares)
  def auditDict(e: AuditEvent) = VectorMap[String, Any](
    "id" -> e.id, "user" -> e.user, "action" -> e.action,
    "resource" -> e.resource, "at" -> e.at)
  def teamDict(t: Team) = VectorMap[String, Any](
    "id" -> t.id, "name" -> t.name, "owner" -> t.owner,
    "members" -> t.members.toList)

  private def upsertOrdered[T](m: Map[String, T], k: String, v: T): Map[String, T] =
    if (m.contains(k)) VectorMap.from(m.map { case (k0, v0) => k0 -> (if (k0 == k) v else v0) })
    else m + (k -> v)

  def saveUsers(path: String, us: collection.Map[String, User]): Unit =
    Files.writeString(Paths.get(path),
      SpecJson.dumps(us.map { case (k, v) => k -> userDict(v) }))
  def saveAcls(path: String, as: collection.Map[String, Acl]): Unit =
    Files.writeString(Paths.get(path),
      SpecJson.dumps(as.map { case (k, v) => k -> aclDict(v) }))
  private def saveAudit(path: String, es: collection.Map[String, AuditEvent]): Unit =
    Files.writeString(Paths.get(path),
      SpecJson.dumps(es.map { case (k, v) => k -> auditDict(v) }))

  // Every load-modify-save below runs under a store lock — the same
  // not-single-threaded-by-accident discipline as the run store: two
  // concurrent registrations must not allocate the same user_N (one
  // account silently destroyed), and concurrent ACL writes must not drop
  // each other's updates (round-13 self-review finding).
  private val usersLock = new Object
  private val aclLock = new Object

  def upsertUser(path: String, u: User): Unit = usersLock.synchronized {
    saveUsers(path, upsertOrdered(loadUsers(path), u.id, u))
  }

  /** Atomic registration: unique-name check + id allocation + append in one
    * locked step. Left = conflict message. */
  def register(path: String, name: String, password: String): Either[String, User] =
    usersLock.synchronized {
      val users = loadUsers(path)
      if (users.values.exists(_.name == name)) Left("user exists")
      else {
        val u = makeUser(s"user_${users.size + 1}", name, password)
        saveUsers(path, upsertOrdered(users, u.id, u))
        Right(u)
      }
    }

  def upsertAcl(path: String, id: String, a: Acl): Unit = aclLock.synchronized {
    saveAcls(path, upsertOrdered(loadAcls(path), id, a))
  }

  /** Claim-if-absent: check-then-act under the lock. */
  def claimAcl(path: String, id: String, owner: String): Unit =
    aclLock.synchronized {
      val as = loadAcls(path)
      if (!as.contains(id))
        saveAcls(path, upsertOrdered(as, id, Acl(owner, "private", VectorMap.empty)))
    }

  def deleteAcl(path: String, id: String): Unit = aclLock.synchronized {
    val as = loadAcls(path)
    if (as.contains(id)) saveAcls(path, as - id)
  }

  /** Atomic create-gate (round-13 advice): the existence check, the
    * edit-permission check, and the claim hold ONE lock, so two concurrent
    * creators of the same new id cannot both pass — the first's claim
    * becomes the arbiter the second's check sees. Returns false = denied
    * (caller answers 403). The caller's store upsert runs after; a loser
    * never reaches it. `exists` (the target store's own row) is checked
    * alongside ACL entries, which include delete tombstones. */
  def checkAndClaim(path: String, id: String, user: Option[String],
                    exists: Boolean,
                    teams: Map[String, Team] = Map.empty): Boolean =
      aclLock.synchronized {
    val as = loadAcls(path)
    if ((exists || as.contains(id)) && !canEdit(as, teams, id, user)) false
    else {
      user.foreach { u =>
        if (!as.contains(id))
          saveAcls(path, upsertOrdered(as, id, Acl(u, "private", VectorMap.empty)))
      }
      true
    }
  }

  // ---- teams (group principals) + per-user settings ----------------------
  private val teamsLock = new Object
  private val profilesLock = new Object

  def saveTeams(path: String, ts: collection.Map[String, Team]): Unit =
    Files.writeString(Paths.get(path),
      SpecJson.dumps(ts.map { case (k, v) => k -> teamDict(v) }))

  /** Atomic team creation: unique-name check + id allocation + append in
    * one locked step, same discipline as `register`. */
  def createTeam(path: String, name: String, owner: String): Either[String, Team] =
    teamsLock.synchronized {
      val ts = loadTeams(path)
      if (ts.values.exists(_.name == name)) Left("team exists")
      else {
        val t = Team(s"team_${ts.size + 1}", name, owner, Vector(owner))
        saveTeams(path, upsertOrdered(ts, t.id, t))
        Right(t)
      }
    }

  /** Locked member add/remove; Left = unknown team. The owner stays a
    * member implicitly (expansion checks owner too), so removing them is
    * allowed but toothless. */
  def updateTeamMembers(path: String, id: String, add: Option[String],
                        remove: Option[String]): Either[String, Team] =
    teamsLock.synchronized {
      loadTeams(path).get(id) match {
        case None => Left("team not found")
        case Some(t) =>
          val afterAdd = add.filterNot(t.members.contains)
            .map(t.members :+ _).getOrElse(t.members)
          val t2 = t.copy(members = remove.map(r => afterAdd.filterNot(_ == r))
            .getOrElse(afterAdd))
          saveTeams(path, upsertOrdered(loadTeams(path), id, t2))
          Right(t2)
      }
    }

  def upsertProfile(path: String, user: String,
                    settings: VectorMap[String, String]): Unit =
    profilesLock.synchronized {
      saveProfiles(path, upsertOrdered(loadProfiles(path), user, settings))
    }

  private def saveProfiles(path: String,
      ps: collection.Map[String, VectorMap[String, String]]): Unit =
    Files.writeString(Paths.get(path),
      SpecJson.dumps(ps.map { case (k, v) => k -> (v: Map[String, String]) }))

  // id allocation + append atomic, same discipline as the run store
  private val auditLock = new Object
  def appendAudit(path: String, user: String, action: String,
                  resource: String, at: String): AuditEvent =
    auditLock.synchronized {
      val es = loadAudit(path)
      val e = AuditEvent(s"ev_${es.size + 1}", user, action, resource, at)
      saveAudit(path, upsertOrdered(es, e.id, e))
      e
    }

  // ---- permission model --------------------------------------------------
  // No ACL entry → the resource predates auth (or auth is off): readable by
  // everyone and editable by any LOGGED-IN user — pre-auth stores must not
  // brick when the first user registers. With an entry: owner has all
  // rights; "public" grants view to all users; shares grant per-user
  // view/edit; delete stays owner-only.
  /** A user's effective share levels on an ACL: the direct per-user share
    * plus every `team:<id>` share whose team counts them as a member (the
    * team's owner is an implicit member). */
  private def shareLevels(a: Acl, teams: Map[String, Team],
                          user: String): Iterator[String] =
    a.shares.iterator.collect {
      case (p, level) if p == user => level
      case (p, level) if p.startsWith("team:") &&
          teams.get(p.stripPrefix("team:"))
            .exists(t => t.members.contains(user) || t.owner == user) => level
    }

  def canView(acls: Map[String, Acl], id: String, user: Option[String]): Boolean =
    canView(acls, Map.empty, id, user)

  def canView(acls: Map[String, Acl], teams: Map[String, Team], id: String,
              user: Option[String]): Boolean =
    acls.get(id) match {
      case None => true
      case Some(a) =>
        a.visibility == "public" || user.contains(a.owner) ||
          user.exists(u => shareLevels(a, teams, u).nonEmpty)
    }

  def canEdit(acls: Map[String, Acl], id: String, user: Option[String]): Boolean =
    canEdit(acls, Map.empty, id, user)

  def canEdit(acls: Map[String, Acl], teams: Map[String, Team], id: String,
              user: Option[String]): Boolean =
    acls.get(id) match {
      case None    => user.isDefined
      case Some(a) =>
        user.contains(a.owner) ||
          user.exists(u => shareLevels(a, teams, u).contains("edit"))
    }

  def isOwner(acls: Map[String, Acl], id: String, user: Option[String]): Boolean =
    acls.get(id) match {
      case None    => user.isDefined
      case Some(a) => user.contains(a.owner)
    }

  /** The requester's relationship to a resource, for the ROADMAP.md:76
    * user dashboard: "owned" | "shared" (a direct or team share grants a
    * level) | "public" (discoverable — public visibility, or an unclaimed
    * legacy id) | "hidden". Consistent with canView: everything but
    * "hidden" is viewable. */
  def relationship(acls: Map[String, Acl], teams: Map[String, Team],
                   id: String, user: Option[String]): String =
    acls.get(id) match {
      case None => "public"
      case Some(a) =>
        if (user.contains(a.owner)) "owned"
        else if (user.exists(u => shareLevels(a, teams, u).nonEmpty)) "shared"
        else if (a.visibility == "public") "public"
        else "hidden"
    }
}
