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
final case class User(id: String, name: String, passwordHash: String, salt: String)

/** `visibility`: "private" (owner + shares only) | "public" (all users).
  * `shares`: user name → "view" | "edit". */
final case class Acl(owner: String, visibility: String,
                     shares: VectorMap[String, String])

final case class AuditEvent(id: String, user: String, action: String,
                            resource: String, at: String)

object Accounts {
  private val mapper = new ObjectMapper()

  // ---- password hashing: PBKDF2-HMAC-SHA256, salted (stdlib only) ------
  private val Iterations = 20000

  private def pbkdf2(password: String, saltHex: String): String = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, hexBytes(saltHex), Iterations, 256)
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
    User(id, name, pbkdf2(password, salt), salt)
  }

  def verify(u: User, password: String): Boolean =
    java.security.MessageDigest.isEqual(
      u.passwordHash.getBytes, pbkdf2(password, u.salt).getBytes)

  // ---- stores -----------------------------------------------------------
  private def readKeyed[T](path: String, f: JsonNode => T): Map[String, T] = {
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    VectorMap.from(root.properties.iterator.asScala.map(e => e.getKey -> f(e.getValue)))
  }

  private def text(n: JsonNode, k: String): String =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText).getOrElse("")

  private def user(n: JsonNode): User =
    User(text(n, "id"), text(n, "name"), text(n, "password_hash"), text(n, "salt"))

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

  def loadUsers(path: String): Map[String, User] =
    if (Files.exists(Paths.get(path))) readKeyed(path, user) else VectorMap.empty
  def loadAcls(path: String): Map[String, Acl] =
    if (Files.exists(Paths.get(path))) readKeyed(path, acl) else VectorMap.empty
  def loadAudit(path: String): Map[String, AuditEvent] =
    if (Files.exists(Paths.get(path))) readKeyed(path, auditEvent) else VectorMap.empty

  private def userDict(u: User) = VectorMap[String, Any](
    "id" -> u.id, "name" -> u.name,
    "password_hash" -> u.passwordHash, "salt" -> u.salt)
  private def aclDict(a: Acl) = VectorMap[String, Any](
    "owner" -> a.owner, "visibility" -> a.visibility, "shares" -> a.shares)
  def auditDict(e: AuditEvent) = VectorMap[String, Any](
    "id" -> e.id, "user" -> e.user, "action" -> e.action,
    "resource" -> e.resource, "at" -> e.at)

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
  def canView(acls: Map[String, Acl], id: String, user: Option[String]): Boolean =
    acls.get(id) match {
      case None => true
      case Some(a) =>
        a.visibility == "public" || user.contains(a.owner) ||
          user.exists(a.shares.contains)
    }

  def canEdit(acls: Map[String, Acl], id: String, user: Option[String]): Boolean =
    acls.get(id) match {
      case None    => user.isDefined
      case Some(a) =>
        user.contains(a.owner) || user.exists(u => a.shares.get(u).contains("edit"))
    }

  def isOwner(acls: Map[String, Acl], id: String, user: Option[String]): Boolean =
    acls.get(id) match {
      case None    => user.isDefined
      case Some(a) => user.contains(a.owner)
    }
}
