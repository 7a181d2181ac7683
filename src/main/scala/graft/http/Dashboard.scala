package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.engine.{Api, RowEdit, RowError, TransformResult}
import graft.spec.{Accounts, ETLMapping, FileSpec, RunRecord, SpecJson, SpecStore, Team, Templates}

/** Thin JSON-over-HTTP shim over the engine — the reference dashboard's API
  * surface (app.py) without the HTML rendering. Closes the EP2/EP3 loop
  * end-to-end: list specs → preview+validate → edit a row → revalidate →
  * convert — every payload mirrors the reference's `jsonify` shapes.
  *
  * Spec/mapping CRUD persists through SpecStore (byte-compatible with the
  * reference's JSON store); processing runs on Spark through Api/Runner.
  * JDK HttpServer, no framework — the server is a harness around the
  * engine, not part of the data path (at scale conversions run as Spark
  * jobs; this shim is the control plane).
  *
  * Routes (reference lines in app.py):
  *   GET  /api/sources | /api/destinations | /api/mappings     (:454-486)
  *   GET  /api/{sources|destinations}/{id}/columns             (:460-480)
  *   POST /api/{sources|destinations}  (body = spec JSON; creates the
  *        input directory + template like :243-252)
  *   POST /api/{sources|destinations|mappings}/{id}/delete     (:272-282)
  *   POST /api/mappings                 (body = mapping JSON, :346-364)
  *   GET  /api/preview/{source}/{file}[?mapping_id=]           (:515-575)
  *   POST /api/preview/{source}/{file}/update                  (:577-623)
  *   POST /api/preview/{source}/{file}/convert                 (:625-677)
  *   POST /api/process/{source}         (all files, :161-231)
  */
final class Dashboard(spark: SparkSession, configDir: String,
                      inputDir: String, outputDir: String, port: Int = 0,
                      // injected so run-history timestamps are
                      // deterministic under test (engine reads no clock)
                      clock: () => String = () => java.time.Instant.now().toString) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  def boundPort: Int = server.getAddress.getPort
  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)

  private def sourcesPath = s"$configDir/sources.json"
  private def destinationsPath = s"$configDir/destinations.json"
  private def mappingsPath = s"$configDir/mappings.json"
  private def runsPath = s"$configDir/runs.json"
  private def templatesPath = s"$configDir/templates.json"
  private def usersPath = s"$configDir/users.json"
  private def aclPath = s"$configDir/acl.json"
  private def auditPath = s"$configDir/audit.json"
  private def teamsPath = s"$configDir/teams.json"
  private def profilesPath = s"$configDir/profiles.json"

  // ---- auth overlay (ROADMAP.md:31-37 "Authentication & User Management",
  // :55-59 "Permissions & Sharing"): local-credential accounts, resource
  // ACLs, audit log — Accounts.scala. Enforcement is on the /api control
  // plane and turns ON when the first user registers (users.json
  // non-empty); with no users the dashboard behaves exactly as before, so
  // pre-auth deployments and the reference-parity surface are unchanged.
  // Sessions are in-process (token cookie), like a dev Flask secret.
  private val sessions = scala.collection.concurrent.TrieMap[String, String]()
  private def authOn: Boolean = Accounts.loadUsers(usersPath).nonEmpty
  private def cookieToken(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Cookie")).toSeq
      .flatMap(_.split(";")).map(_.trim)
      .collectFirst { case c if c.startsWith("session=") => c.stripPrefix("session=") }
  private def currentUser(ex: HttpExchange): Option[String] =
    cookieToken(ex).flatMap(sessions.get)
  private def audit(user: Option[String], action: String, resource: String): Unit =
    if (authOn)
      Accounts.appendAudit(auditPath, user.getOrElse("anonymous"), action,
        resource, clock())
  private def loadTeams(): Map[String, Team] = Accounts.loadTeams(teamsPath)

  /** Upsert permission + claim in ONE locked store step (round-13 advice:
    * the check → upsert → claim sequence raced). Denied (true) when the
    * target id exists in the store OR carries an ACL entry — including a
    * DELETE TOMBSTONE (deletes keep the ACL so a private mapping's run
    * history cannot become everyone-visible the moment it's deleted, and
    * so another user cannot squat the id; round-13 self-review) — and the
    * caller cannot edit it. Otherwise a logged-in creator claims the id
    * (owner = creator, private by default) BEFORE the store upsert, so a
    * concurrent creator of the same id is arbitrated by the ACL. Every
    * path that writes a caller-chosen id into a store goes through this,
    * including the HTML form POSTs and the instantiate/save_template side
    * doors. */
  private def upsertDenied(exists: Boolean, id: String, user: Option[String]): Boolean =
    authOn && !Accounts.checkAndClaim(aclPath, id, user, exists, loadTeams())
  private def visibleKeys[T](m: Map[String, T], user: Option[String]): Map[String, T] =
    if (!authOn) m
    else {
      val acls = Accounts.loadAcls(aclPath)
      val teams = loadTeams()
      m.filter { case (k, _) => Accounts.canView(acls, teams, k, user) }
    }

  /** Permission gate for the whole surface in auth mode; None = allowed.
    * The HTML pages and file routes enforce the SAME model as /api
    * (round-13 advice: the form POSTs and upload/download/delete were side
    * doors around the ACLs). Listings pass (filtered in-branch);
    * body-dependent upsert permission is checked in-branch too (the body
    * can only be read once). */
  private def authGate(segs: List[String], post: Boolean,
                       user: Option[String]): Option[(Int, String)] = {
    val acls = Accounts.loadAcls(aclPath)
    val teams = loadTeams()
    def login = if (user.isDefined) None else Some(401 -> "Login required")
    def view(id: String) =
      if (Accounts.canView(acls, teams, id, user)) None
      else Some(404 -> "Not found") // invisible, not just forbidden
    def edit(id: String) =
      login.orElse(if (Accounts.canEdit(acls, teams, id, user)) None
                   else Some(403 -> "Forbidden"))
    def owner(id: String) =
      login.orElse(if (Accounts.isOwner(acls, id, user)) None
                   else Some(403 -> "Owner only"))
    segs match {
      case "api" :: "me" :: ("settings" | "resources") :: Nil => login
      case "me" :: Nil => login
      case "api" :: ("login" | "logout" | "users" | "me" | "acl") :: _ => None
      case "api" :: "teams" :: _ => login
      case "api" :: ("sources" | "destinations" | "mappings" | "templates") ::
           Nil if post => login
      case "api" :: ("sources" | "destinations") :: id :: "columns" :: Nil =>
        view(id)
      case "api" :: ("sources" | "destinations" | "mappings" | "templates") ::
           id :: "delete" :: Nil if post => owner(id)
      case "api" :: "mappings" :: id :: "save" :: Nil if post => edit(id)
      case "api" :: "mappings" :: id :: "save_template" :: Nil if post =>
        login.orElse(view(id))
      case "api" :: "templates" :: id :: "instantiate" :: Nil if post =>
        login.orElse(view(id))
      case "api" :: "preview" :: sid :: _ :: Nil => view(sid)
      case "api" :: "preview" :: sid :: _ :: "update" :: Nil if post => edit(sid)
      case "api" :: "preview" :: sid :: _ :: "convert" :: Nil if post => view(sid)
      case "api" :: "process" :: sid :: Nil if post => view(sid)
      case "api" :: ("runs" | "audit") :: Nil => login
      // ---- HTML pages + file routes: same model as their /api twins ----
      case ("sources" | "destinations" | "mappings") :: "new" :: Nil =>
        if (post) login else None // skeleton form leaks nothing; POST gated
      case ("sources" | "destinations" | "mappings") :: id :: "edit" :: Nil =>
        // GET needs the stored JSON → edit-level like the visual save; the
        // POST's body names its own id, checked in-branch via upsertDenied
        if (post) login else edit(id)
      case "mappings" :: id :: "visual" :: Nil => view(id)
      case "preview" :: sid :: _ :: Nil => view(sid)
      case "upload" :: sid :: Nil if post => edit(sid)
      // download/delete map a DIRECTORY back to its owning spec — needs a
      // store lookup, enforced in-branch by fileAuthError
      case _ => None
    }
  }

  /** File-route gate (round-13 advice: upload/download/delete bypassed the
    * ACLs): map the route's leading directory segment back to the spec
    * that owns it and apply the /api-equivalent rule — download = canView
    * of the owning destination (404, invisible), delete = canEdit of the
    * owning source/destination. A directory no spec claims has nothing to
    * scope by → any logged-in user (legacy behavior, matching the no-ACL
    * store rule). */
  private def fileAuthError(specPath: String, rel: String, user: Option[String],
                            needEdit: Boolean): Option[(Int, String)] =
    if (!authOn) None
    else {
      val dir = rel.split("/")(0)
      val owningId = SpecStore.loadFileSpecs(specPath).collectFirst {
        case (id, sp) if sp.defaultDirectory == dir => id
      }
      val acls = Accounts.loadAcls(aclPath)
      val teams = loadTeams()
      owningId match {
        case Some(id) if needEdit =>
          if (user.isEmpty) Some(401 -> "Login required")
          else if (!Accounts.canEdit(acls, teams, id, user)) Some(403 -> "Forbidden")
          else None
        case Some(id) =>
          if (Accounts.canView(acls, teams, id, user)) None
          else Some(404 -> "Not found")
        case None =>
          if (user.isDefined) None else Some(401 -> "Login required")
      }
    }

  /** D5 run history: build one run's summary; ids continue from `from`
    * (`run_N`). Store size is one row per run — metadata, never
    * data-scale. */
  private def runRecordOf(from: Int, kind: String, mapping: ETLMapping,
                          input: String, out: Option[String],
                          r: TransformResult, startedAt: String,
                          finishedAt: String = null): RunRecord =
    graft.spec.RunRecord(
      id = s"run_${from + 1}", mappingId = mapping.id, kind = kind,
      inputFile = Paths.get(input).getFileName.toString, outputFile = out,
      successCount = r.successCount, skippedCount = r.skippedCount,
      errorCount = r.errorCount, written = r.written,
      startedAt = startedAt,
      // the process loop defers record building to the locked batch append,
      // so it captures finishedAt at convert time; direct callers let the
      // record stamp itself
      finishedAt = if (finishedAt != null) finishedAt else clock())

  private def recordRun(kind: String, mapping: ETLMapping, input: String,
                        out: Option[String], r: TransformResult,
                        startedAt: String): RunRecord =
    // id allocation + append are atomic at the store (round-12 verdict
    // item 6): concurrent converts get distinct ids, both records survive
    SpecStore.appendRunNext(runsPath,
      from => runRecordOf(from, kind, mapping, input, out, r, startedAt))

  // ---- plumbing ----

  private def respond(ex: HttpExchange, status: Int, payload: Any): Unit = {
    val body = SpecJson.dumps(payload).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  private def err(ex: HttpExchange, status: Int, message: String): Unit =
    respond(ex, status, VectorMap("error" -> message))

  /** Store ids grouped by the requester's relationship (Accounts
    * .relationship); "hidden" ids are dropped — the dashboard must not
    * enumerate what the listings would not show. Delete tombstones never
    * appear (they have an ACL but no store row). */
  private def meResources(user: Option[String]): VectorMap[String, Any] = {
    val acls = Accounts.loadAcls(aclPath)
    val teams = loadTeams()
    def part(ids: Iterable[String]): VectorMap[String, Any] = {
      val rel = ids.toSeq.sorted
        .groupBy(id => Accounts.relationship(acls, teams, id, user))
      VectorMap[String, Any](
        "owned" -> rel.getOrElse("owned", Nil).toList,
        "shared" -> rel.getOrElse("shared", Nil).toList,
        "public" -> rel.getOrElse("public", Nil).toList)
    }
    VectorMap[String, Any](
      "sources" -> part(SpecStore.loadFileSpecs(sourcesPath).keys),
      "destinations" -> part(SpecStore.loadFileSpecs(destinationsPath).keys),
      "mappings" -> part(SpecStore.loadMappings(mappingsPath).keys),
      "templates" -> part(SpecStore.loadTemplates(templatesPath).keys))
  }

  /** ROADMAP.md:71 "Dark mode": a logged-in user whose settings carry
    * `theme=dark` gets the page shell's dark class; the stylesheet ships
    * both palettes so the toggle is one attribute. */
  private def darkFor(user: Option[String]): Boolean =
    user.exists(u => Accounts.loadProfiles(profilesPath)
      .getOrElse(u, VectorMap.empty).get("theme").contains("dark"))

  private def html(ex: HttpExchange, markup0: String, status: Int = 200,
                   user: Option[String] = None): Unit = {
    val markup = if (darkFor(user))
      markup0.replaceFirst("<body>", "<body class=\"dark\">") else markup0
    val body = markup.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    ex.sendResponseHeaders(status, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap)
      .getOrElse(Map.empty)

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch { case e: Exception => err(ex, 500, s"Internal error: ${e.getMessage}") }

  private def route(ex: HttpExchange): Unit = {
    val segs = ex.getRequestURI.getPath.stripPrefix("/").split("/").toList
    val post = ex.getRequestMethod == "POST"
    val user = currentUser(ex)
    if (authOn) authGate(segs, post, user) match {
      case Some((code, msg)) => err(ex, code, msg); return
      case None =>
    }
    segs match {
      case "api" :: "sources" :: rest => specRoutes(ex, post, sourcesPath, rest,
        createDir = true, user)
      case "api" :: "destinations" :: rest => specRoutes(ex, post, destinationsPath,
        rest, createDir = false, user)
      case "api" :: "mappings" :: Nil if !post =>
        respond(ex, 200, visibleKeys(SpecStore.loadMappings(mappingsPath), user)
          .map { case (k, v) => k -> SpecJson.etlMappingDict(v) })
      case "api" :: "mappings" :: Nil =>
        val m = SpecStore.parseMapping(readBody(ex))
        if (upsertDenied(SpecStore.loadMappings(mappingsPath).contains(m.id),
            m.id, user))
          err(ex, 403, "Forbidden")
        else {
          SpecStore.upsertMapping(mappingsPath, m)
          audit(user, "save_mapping", m.id)
          respond(ex, 200, VectorMap("success" -> true, "id" -> m.id))
        }
      case "api" :: "mappings" :: id :: "delete" :: Nil if post =>
        val ok = SpecStore.deleteMapping(mappingsPath, id)
        // the ACL entry stays as a tombstone — see upsertDenied's note
        if (ok) audit(user, "delete_mapping", id)
        respond(ex, 200, VectorMap("success" -> ok))
      case "api" :: "mappings" :: id :: "save" :: Nil if post =>
        saveMappingFromEditor(ex, id)
      case "upload" :: sourceId :: Nil if post =>
        upload(ex, sourceId)
      case "download" :: rest if rest.nonEmpty && !post =>
        fileAuthError(destinationsPath, rest.mkString("/"), user,
            needEdit = false) match {
          case Some((code, msg)) => err(ex, code, msg)
          case None => download(ex, rest.mkString("/"))
        }
      case "delete" :: fileType :: rest if rest.nonEmpty && post =>
        val specPath = if (fileType == "input") sourcesPath else destinationsPath
        fileAuthError(specPath, rest.mkString("/"), user, needEdit = true) match {
          case Some((code, msg)) => err(ex, code, msg)
          case None => deleteFile(ex, fileType, rest.mkString("/"))
        }
      case "api" :: "preview" :: sourceId :: filename :: Nil if !post =>
        preview(ex, sourceId, filename, user)
      case "api" :: "preview" :: sourceId :: filename :: "update" :: Nil if post =>
        update(ex, sourceId, filename, user)
      case "api" :: "preview" :: sourceId :: filename :: "convert" :: Nil if post =>
        convert(ex, sourceId, filename, user)
      case "api" :: "process" :: sourceId :: Nil if post =>
        process(ex, sourceId, user)
      // D6 mapping-template library: CRUD over templates.json plus
      // instantiate-with-rename into the mapping store
      case "api" :: "templates" :: Nil if !post =>
        respond(ex, 200, visibleKeys(SpecStore.loadTemplates(templatesPath), user)
          .map { case (k, v) => k -> SpecJson.etlMappingDict(v) })
      case "api" :: "templates" :: Nil =>
        val t = SpecStore.parseMapping(readBody(ex))
        if (upsertDenied(SpecStore.loadTemplates(templatesPath).contains(t.id),
            t.id, user))
          err(ex, 403, "Forbidden")
        else {
          SpecStore.upsertTemplate(templatesPath, t)
          audit(user, "save_template", t.id)
          respond(ex, 200, VectorMap("success" -> true, "id" -> t.id))
        }
      case "api" :: "templates" :: id :: "delete" :: Nil if post =>
        val ok = SpecStore.deleteTemplate(templatesPath, id)
        if (ok) audit(user, "delete_template", id)
        respond(ex, 200, VectorMap("success" -> ok))
      case "api" :: "templates" :: id :: "instantiate" :: Nil if post =>
        SpecStore.loadTemplates(templatesPath).get(id) match {
          case None => err(ex, 404, "Template not found")
          case Some(t) =>
            val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
            def field(k: String, d: String) = data.get(k).map(String.valueOf).getOrElse(d)
            val m = Templates.instantiate(t,
              newId = field("id", s"${id}_copy"),
              newName = field("name", t.name),
              sourceId = field("source_id", t.sourceId),
              destinationId = field("destination_id", t.destinationId))
            if (upsertDenied(SpecStore.loadMappings(mappingsPath).contains(m.id),
                m.id, user)) { err(ex, 403, "Forbidden"); return }
            SpecStore.upsertMapping(mappingsPath, m)
            audit(user, "instantiate_template", s"$id -> ${m.id}")
            respond(ex, 200, VectorMap("success" -> true, "id" -> m.id))
        }
      // save an existing mapping back into the library
      case "api" :: "mappings" :: id :: "save_template" :: Nil if post =>
        SpecStore.loadMappings(mappingsPath).get(id) match {
          case None => err(ex, 404, "Mapping not found")
          case Some(m) =>
            val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
            val tid = data.get("template_id").map(String.valueOf).getOrElse(s"${id}_template")
            val tname = data.get("name").map(String.valueOf).getOrElse(m.name)
            if (upsertDenied(SpecStore.loadTemplates(templatesPath).contains(tid),
                tid, user)) { err(ex, 403, "Forbidden"); return }
            SpecStore.upsertTemplate(templatesPath, m.copy(id = tid, name = tname))
            audit(user, "save_template", tid)
            respond(ex, 200, VectorMap("success" -> true, "id" -> tid))
        }
      case "templates" :: Nil if !post =>
        html(ex, Pages.templateList(
          visibleKeys(SpecStore.loadTemplates(templatesPath), user)), user = user)
      // D5 run history: the durable twin of the reference's session-held
      // conversion counters (app.py:215-224)
      case "api" :: "runs" :: Nil if !post =>
        // auth mode: a run is visible when its mapping is (team-expanded —
        // visibleKeys keyed by the run's mappingId; the matrix spec caught
        // the team-blind overload lingering here after teams shipped)
        val runs0 = SpecStore.loadRuns(runsPath)
        val runs =
          if (!authOn) runs0
          else {
            val visible = visibleKeys(
              runs0.values.map(r => r.mappingId -> ()).toMap, user).keySet
            runs0.filter { case (_, r) => visible.contains(r.mappingId) }
          }
        respond(ex, 200, runs.map { case (k, v) => k -> SpecJson.runRecordDict(v) })
      case "runs" :: Nil if !post =>
        // same visibility contract as /api/runs (anonymous page viewers
        // see only public/legacy mappings' runs)
        val prs0 = SpecStore.loadRuns(runsPath)
        val prs =
          if (!authOn) prs0
          else {
            val visible = visibleKeys(
              prs0.values.map(r => r.mappingId -> ()).toMap, user).keySet
            prs0.filter { case (_, r) => visible.contains(r.mappingId) }
          }
        html(ex, Pages.runList(prs,
          visibleKeys(SpecStore.loadMappings(mappingsPath), user)), user = user)
      // ---- server-rendered pages (reference app.py:53-101, :237-448,
      // :492-513; original markup in Pages.scala, state from SpecStore) ----
      case ("" :: Nil | Nil) if !post =>
        // pages show exactly what the /api listings would (auth mode
        // filters by visibility; round-13 advice)
        val sources = visibleKeys(SpecStore.loadFileSpecs(sourcesPath), user)
        val dests = visibleKeys(SpecStore.loadFileSpecs(destinationsPath), user)
        def csvs(baseDir: String, specs: Map[String, FileSpec]) =
          specs.toSeq.map { case (id, sp) =>
            val d = Paths.get(baseDir, sp.defaultDirectory)
            id -> (if (Files.isDirectory(d)) {
              val stream = Files.list(d)
              try stream.iterator.asScala.map(_.getFileName.toString)
                .filter(_.endsWith(".csv")).toSeq.sorted
              finally stream.close()
            } else Seq.empty[String])
          }.toMap
        html(ex, Pages.index(sources, dests,
          visibleKeys(SpecStore.loadMappings(mappingsPath), user),
          csvs(inputDir, sources), csvs(outputDir, dests)), user = user)
      case "sources" :: Nil if !post =>
        html(ex, Pages.specList("source",
          visibleKeys(SpecStore.loadFileSpecs(sourcesPath), user)), user = user)
      case "destinations" :: Nil if !post =>
        html(ex, Pages.specList("destination",
          visibleKeys(SpecStore.loadFileSpecs(destinationsPath), user)), user = user)
      case "mappings" :: Nil if !post =>
        html(ex, Pages.mappingList(
          visibleKeys(SpecStore.loadMappings(mappingsPath), user)), user = user)
      // new/edit forms (reference app.py:243-270, :291-318, :346-390);
      // GET gated by authGate (edit level), POSTs re-check the BODY's id
      case "sources" :: "new" :: Nil =>
        specForm(ex, post, sourcesPath, "source", None, createDir = true, user)
      case "sources" :: id :: "edit" :: Nil =>
        specForm(ex, post, sourcesPath, "source", Some(id), createDir = true, user)
      case "destinations" :: "new" :: Nil =>
        specForm(ex, post, destinationsPath, "destination", None,
          createDir = false, user)
      case "destinations" :: id :: "edit" :: Nil =>
        specForm(ex, post, destinationsPath, "destination", Some(id),
          createDir = false, user)
      case "mappings" :: "new" :: Nil =>
        mappingForm(ex, post, None, user)
      case "mappings" :: id :: "edit" :: Nil =>
        mappingForm(ex, post, Some(id), user)
      case "mappings" :: id :: "visual" :: Nil if !post =>
        SpecStore.loadMappings(mappingsPath).get(id) match {
          case None => err(ex, 404, "Mapping not found")
          // the source panel (column names) is itself ACL'd — a viewer of
          // the mapping must not read a PRIVATE source's schema through
          // this page when /api/sources/:id/columns would 404 it
          // (round-14 self-review)
          case Some(m) => html(ex, Pages.visualEditor(m,
            visibleKeys(SpecStore.loadFileSpecs(sourcesPath), user)
              .get(m.sourceId)), user = user)
        }
      case "preview" :: sourceId :: filename :: Nil if !post =>
        withSourceFile(ex, sourceId, filename) { (source, path) =>
          val mapping = visibleMapping(
            queryParams(ex).get("mapping_id"), user)
          val p = Api.preview(spark, path, source, mapping, n = 100)
          html(ex, Pages.previewGrid(sourceId, filename,
            source.columns.map(_.name),
            p.rows.map(r => r.line -> r.cells),
            p.errorsByLine.keySet,
            p.result.map(r => (r.successCount, r.skippedCount, r.errorCount)),
            p.rows.length.toLong), user = user)
        }
      // ---- auth / sharing / audit (ROADMAP.md:31-37, :55-59; see the
      // overlay notes above authGate). Registration is open (self-serve,
      // like the reference's wished-for flow) and ENABLES enforcement on
      // first use; login issues an in-process session cookie. ----
      case "api" :: "users" :: Nil if post =>
        val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
        val name = data.get("name").map(String.valueOf).getOrElse("")
        val pw = data.get("password").map(String.valueOf).getOrElse("")
        if (name.isEmpty || pw.isEmpty) err(ex, 400, "name and password required")
        else Accounts.register(usersPath, name, pw) match {
          case Left(msg) => err(ex, 409, msg)
          case Right(u) =>
            audit(Some(name), "register", u.id)
            respond(ex, 200, VectorMap("success" -> true, "id" -> u.id))
        }
      case "api" :: "login" :: Nil if post =>
        val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
        val name = data.get("name").map(String.valueOf).getOrElse("")
        val pw = data.get("password").map(String.valueOf).getOrElse("")
        Accounts.loadUsers(usersPath).values.find(_.name == name) match {
          case Some(u) if Accounts.verify(u, pw) =>
            val token = java.util.UUID.randomUUID().toString
            sessions.put(token, name)
            // SameSite=Strict: state-changing POSTs can't be replayed from
            // another origin's page (round-13 verdict item 3)
            ex.getResponseHeaders.add("Set-Cookie",
              s"session=$token; HttpOnly; SameSite=Strict")
            audit(Some(name), "login", u.id)
            respond(ex, 200, VectorMap("success" -> true, "user" -> name))
          case _ => err(ex, 401, "invalid credentials")
        }
      case "api" :: "logout" :: Nil if post =>
        cookieToken(ex).foreach(sessions.remove)
        respond(ex, 200, VectorMap("success" -> true))
      case "api" :: "me" :: Nil if !post =>
        respond(ex, 200, VectorMap[String, Any]("user" -> user.orNull))
      case "api" :: "acl" :: id :: Nil if !post =>
        val acls0 = Accounts.loadAcls(aclPath)
        acls0.get(id) match {
          case None => err(ex, 404, "No ACL for resource")
          // ACL metadata is only as visible as the resource itself — a
          // private mapping must not leak its owner/share list. Team
          // expansion included (the matrix spec caught this branch still
          // using the team-blind overload after teams shipped)
          case Some(_) if authOn &&
              !Accounts.canView(acls0, loadTeams(), id, user) =>
            err(ex, 404, "Not found")
          case Some(a) => respond(ex, 200, VectorMap[String, Any](
            "owner" -> a.owner, "visibility" -> a.visibility,
            "shares" -> a.shares))
        }
      case "api" :: "acl" :: id :: Nil if post =>
        val acls = Accounts.loadAcls(aclPath)
        if (!authOn) err(ex, 400, "auth disabled - register a user first")
        else if (user.isEmpty) err(ex, 401, "Login required")
        else if (!Accounts.isOwner(acls, id, user)) err(ex, 403, "Owner only")
        else {
          val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
          val prev = acls.getOrElse(id,
            graft.spec.Acl(user.get, "private", VectorMap.empty))
          val vis = data.get("visibility").map(String.valueOf)
            .getOrElse(prev.visibility)
          val withShare = data.get("share") match {
            case Some(s: Map[_, _]) =>
              val sm = s.asInstanceOf[Map[String, Any]]
              val level = sm.get("level").map(String.valueOf).getOrElse("view")
              sm.get("user").map(String.valueOf) match {
                case Some(target) if Seq("view", "edit").contains(level) =>
                  Right(prev.shares.updated(target, level)
                    .to(VectorMap))
                case _ => Left("share needs user + level view|edit")
              }
            case _ => Right(prev.shares)
          }
          (withShare, Seq("private", "public").contains(vis)) match {
            case (Left(msg), _) => err(ex, 400, msg)
            case (_, false) => err(ex, 400, "visibility must be private|public")
            case (Right(shares0), true) =>
              val shares = data.get("revoke").map(String.valueOf) match {
                case Some(target) => (shares0 - target).to(VectorMap)
                case None => shares0
              }
              Accounts.upsertAcl(aclPath, id, prev.copy(
                visibility = vis, shares = shares))
              audit(user, "acl_update", id)
              respond(ex, 200, VectorMap("success" -> true))
          }
        }
      // audit is scoped to visibility (round-13 verdict item 1): your own
      // events always; someone else's only when EVERY resource id the
      // event names is visible to you — private resources stay invisible
      // in the log exactly as they are in the listings. Composite
      // resources ("src/file", "tpl -> mapping") must pass on all parts.
      case "api" :: "audit" :: Nil if !post =>
        val acls = Accounts.loadAcls(aclPath)
        val tms = loadTeams()
        // a TEAM id in an event resolves against the team store, not the
        // ACL store: its events are member/owner-visible, matching the
        // /api/teams listing filter (round-14 self-review — the no-ACL
        // default otherwise showed team activity to every login)
        def resourceVisible(r: String): Boolean = {
          val id = r.split("/")(0).split(" ")(0)
          tms.get(id) match {
            case Some(t) => user.contains(t.owner) || user.exists(t.members.contains)
            case None => Accounts.canView(acls, tms, id, user)
          }
        }
        val es = Accounts.loadAudit(auditPath).filter { case (_, e) =>
          user.contains(e.user) || e.resource.split(" -> ").forall(resourceVisible)
        }
        respond(ex, 200, es.map { case (k, v) => k -> Accounts.auditDict(v) })
      // ---- teams (ROADMAP.md:36 "Organization/team support"): groups as
      // ACL principals — share a resource with `team:<id>` and every
      // member gets that level. Login-gated (authGate); creation is
      // self-serve like registration, membership edits are owner-only. ----
      case "api" :: "teams" :: Nil if !post =>
        val ts = loadTeams().filter { case (_, t) =>
          user.contains(t.owner) || user.exists(t.members.contains) }
        respond(ex, 200, ts.map { case (k, v) => k -> Accounts.teamDict(v) })
      case "api" :: "teams" :: Nil if post =>
        if (!authOn) err(ex, 400, "auth disabled - register a user first")
        else {
          val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
          data.get("name").map(String.valueOf).filter(_.nonEmpty) match {
            case None => err(ex, 400, "name required")
            case Some(name) => Accounts.createTeam(teamsPath, name, user.get) match {
              case Left(msg) => err(ex, 409, msg)
              case Right(t) =>
                audit(user, "create_team", t.id)
                respond(ex, 200, VectorMap("success" -> true, "id" -> t.id))
            }
          }
        }
      case "api" :: "teams" :: id :: "members" :: Nil if post =>
        loadTeams().get(id) match {
          case None => err(ex, 404, "team not found")
          case Some(t) if !user.contains(t.owner) => err(ex, 403, "Owner only")
          case Some(_) =>
            val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
            val add = data.get("add").map(String.valueOf)
            val remove = data.get("remove").map(String.valueOf)
            Accounts.updateTeamMembers(teamsPath, id, add, remove) match {
              case Left(msg) => err(ex, 404, msg)
              case Right(t2) =>
                // membership changes are audited (round-13 verdict item 4)
                audit(user, "team_members",
                  s"$id${add.map(a => s" +$a").getOrElse("")}" +
                    remove.map(r => s" -$r").getOrElse(""))
                respond(ex, 200, VectorMap[String, Any](
                  "success" -> true, "members" -> t2.members.toList))
            }
        }
      // ---- per-user settings (ROADMAP.md:58 "User profiles"): a small
      // keyed store, ACL'd to the user themselves (login-gated). ----
      case "api" :: "me" :: ("settings" | "resources") :: Nil if user.isEmpty =>
        err(ex, 401, "Login required") // open mode has no user to key by
      // ROADMAP.md:76 "User dashboard with owned and shared resources":
      // each store's ids grouped by the requester's relationship. Hidden
      // ids never appear (same invisibility contract as the listings).
      case "api" :: "me" :: "resources" :: Nil if !post =>
        respond(ex, 200, meResources(user))
      case "me" :: Nil if user.isEmpty =>
        err(ex, 401, "Login required") // open mode has no user to key by
      case "me" :: Nil if !post =>
        val r = meResources(user)
        html(ex, Pages.meDashboard(user.get,
          Seq("sources", "destinations", "mappings", "templates").map { k =>
            val m = r(k).asInstanceOf[VectorMap[String, List[String]]]
            (k, m("owned"), m("shared"), m("public"))
          }), user = user)
      case "api" :: "me" :: "settings" :: Nil if !post =>
        respond(ex, 200,
          Accounts.loadProfiles(profilesPath).getOrElse(user.get, VectorMap.empty))
      case "api" :: "me" :: "settings" :: Nil if post =>
        val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
        val settings = VectorMap.from(data.iterator
          .map { case (k, v) => k -> String.valueOf(v) })
        Accounts.upsertProfile(profilesPath, user.get, settings)
        audit(user, "settings_update", user.get)
        respond(ex, 200, VectorMap("success" -> true))
      case _ => err(ex, 404, "Not found")
    }
  }

  // ---- HTML form CRUD ----

  private def formParams(body: String): Map[String, String] =
    body.split("&").toSeq.map(_.split("=", 2)).collect {
      case Array(k, v) =>
        java.net.URLDecoder.decode(k, StandardCharsets.UTF_8) ->
          java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap

  private def redirect(ex: HttpExchange, target: String): Unit = {
    ex.getResponseHeaders.set("Location", target)
    ex.sendResponseHeaders(302, -1)
    ex.close()
  }

  private val specSkeleton =
    """{
      |  "id": "my_source",
      |  "name": "My Source",
      |  "description": "",
      |  "default_directory": "my_source",
      |  "columns": []
      |}""".stripMargin

  private def specForm(ex: HttpExchange, post: Boolean, path: String,
                       specType: String, idOpt: Option[String],
                       createDir: Boolean, user: Option[String]): Unit =
    if (!post) {
      (idOpt, idOpt.flatMap(SpecStore.loadFileSpecs(path).get)) match {
        case (Some(_), None) => err(ex, 404, s"${specType.capitalize} not found")
        case (_, found) =>
          val json = found.map(s => SpecJson.dumps(SpecJson.fileSpecDict(s)))
            .getOrElse(specSkeleton)
          html(ex, Pages.editorForm(
            idOpt.map(i => s"Edit $specType $i").getOrElse(s"New $specType"),
            "spec", json), user = user)
      }
    } else {
      val spec = SpecStore.parseFileSpec(
        formParams(readBody(ex)).getOrElse("spec", ""))
      // the form POST writes the BODY's id — same gate as POST /api/…
      // (round-13 advice: this was an ACL side door)
      if (upsertDenied(SpecStore.loadFileSpecs(path).contains(spec.id),
          spec.id, user))
        err(ex, 403, "Forbidden")
      else {
        SpecStore.upsertFileSpec(path, spec)
        if (createDir) Templates.createSpecDirectoryAndTemplate(spec, inputDir)
        audit(user, "save_spec", spec.id)
        redirect(ex, s"/${specType}s")
      }
    }

  private def mappingForm(ex: HttpExchange, post: Boolean,
                          idOpt: Option[String], user: Option[String]): Unit =
    if (!post) {
      (idOpt, idOpt.flatMap(SpecStore.loadMappings(mappingsPath).get)) match {
        case (Some(_), None) => err(ex, 404, "Mapping not found")
        case (_, found) =>
          val json = found.map(m => SpecJson.dumps(SpecJson.etlMappingDict(m)))
            .getOrElse("""{
              |  "id": "my_mapping",
              |  "name": "My Mapping",
              |  "source_id": "",
              |  "destination_id": "",
              |  "field_mappings": [],
              |  "filter_rules": []
              |}""".stripMargin)
          html(ex, Pages.editorForm(
            idOpt.map(i => s"Edit mapping $i").getOrElse("New mapping"),
            "mapping", json), user = user)
      }
    } else {
      val m = SpecStore.parseMapping(
        formParams(readBody(ex)).getOrElse("mapping", ""))
      if (upsertDenied(SpecStore.loadMappings(mappingsPath).contains(m.id),
          m.id, user))
        err(ex, 403, "Forbidden")
      else {
        SpecStore.upsertMapping(mappingsPath, m)
        audit(user, "save_mapping", m.id)
        redirect(ex, "/mappings")
      }
    }

  // ---- spec CRUD (sources + destinations share shape) ----

  private def specRoutes(ex: HttpExchange, post: Boolean, path: String,
                         rest: List[String], createDir: Boolean,
                         user: Option[String]): Unit = rest match {
    case Nil if !post =>
      respond(ex, 200, visibleKeys(SpecStore.loadFileSpecs(path), user)
        .map { case (k, v) => k -> SpecJson.fileSpecDict(v) })
    case Nil =>
      val spec = SpecStore.parseFileSpec(readBody(ex))
      if (upsertDenied(SpecStore.loadFileSpecs(path).contains(spec.id),
          spec.id, user))
        err(ex, 403, "Forbidden")
      else {
        SpecStore.upsertFileSpec(path, spec)
        if (createDir) Templates.createSpecDirectoryAndTemplate(spec, inputDir)
        audit(user, "save_spec", spec.id)
        respond(ex, 200, VectorMap("success" -> true, "id" -> spec.id))
      }
    case id :: "columns" :: Nil if !post =>
      SpecStore.loadFileSpecs(path).get(id) match {
        case None => err(ex, 404, "Source not found")
        case Some(s) => respond(ex, 200, s.columns.map(SpecJson.columnSpecDict).toList)
      }
    case id :: "delete" :: Nil if post =>
      val ok = SpecStore.deleteFileSpec(path, id)
      if (ok) audit(user, "delete_spec", id)
      respond(ex, 200, VectorMap("success" -> ok))
    case _ => err(ex, 404, "Not found")
  }

  /** app.py:424-448 — visual-editor save: replace field_mappings and
    * filter_rules of an EXISTING mapping, 404 otherwise. */
  private def saveMappingFromEditor(ex: HttpExchange, id: String): Unit =
    SpecStore.loadMappings(mappingsPath).get(id) match {
      case None => err(ex, 404, "Mapping not found")
      case Some(existing) =>
        // parseMapping tolerates the partial payload (missing ids default)
        val body = SpecStore.parseMapping(readBody(ex))
        SpecStore.upsertMapping(mappingsPath, existing.copy(
          fieldMappings = body.fieldMappings, filterRules = body.filterRules))
        respond(ex, 200, VectorMap("success" -> true, "message" -> "Mapping saved"))
    }

  // ---- files (app.py:103-158) ----

  /** The reference uploads multipart form files; this JSON shim takes the
    * raw CSV body with `?filename=`. Only *.csv is accepted, like the
    * reference. */
  private def upload(ex: HttpExchange, sourceId: String): Unit =
    SpecStore.loadFileSpecs(sourcesPath).get(sourceId) match {
      case None => err(ex, 404, s"Source '$sourceId' not found")
      case Some(source) =>
        queryParams(ex).get("filename") match {
          case Some(f) if f.endsWith(".csv") && !f.contains("/") && !f.contains("..") =>
            val dir = Paths.get(inputDir, source.defaultDirectory)
            Files.createDirectories(dir)
            Files.write(dir.resolve(f), ex.getRequestBody.readAllBytes())
            respond(ex, 200, VectorMap("success" -> true, "filename" -> f))
          case _ => err(ex, 400, "Only CSV files are allowed")
        }
    }

  private def safeResolve(base: String, rel: String) = {
    val p = Paths.get(base).toAbsolutePath.normalize
      .resolve(rel).normalize
    if (p.startsWith(Paths.get(base).toAbsolutePath.normalize)) Some(p) else None
  }

  private def download(ex: HttpExchange, rel: String): Unit =
    safeResolve(outputDir, rel).filter(Files.exists(_)) match {
      case None => err(ex, 404, "File not found")
      case Some(p) =>
        val bytes = Files.readAllBytes(p)
        ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
    }

  private def deleteFile(ex: HttpExchange, fileType: String, rel: String): Unit = {
    val base = if (fileType == "input") inputDir else outputDir
    safeResolve(base, rel).filter(Files.exists(_)) match {
      case None => err(ex, 404, "File not found")
      case Some(p) => Files.delete(p)
        respond(ex, 200, VectorMap("success" -> true))
    }
  }

  // ---- preview / edit / convert / process ----

  private def withSourceFile(ex: HttpExchange, sourceId: String, filename: String)
                            (body: (FileSpec, String) => Unit): Unit =
    SpecStore.loadFileSpecs(sourcesPath).get(sourceId) match {
      case None => err(ex, 404, "Source not found")
      case Some(source) =>
        val p = Paths.get(inputDir, source.defaultDirectory, filename)
        if (!Files.exists(p)) err(ex, 404, "File not found")
        else body(source, p.toString)
    }

  private def errorDicts(errors: Seq[RowError]): List[VectorMap[String, Any]] =
    errors.map(e => VectorMap[String, Any](
      "field" -> e.field, "message" -> e.error_message,
      "value" -> e.source_value)).toList

  /** Resolve a `?mapping_id=` the way the listing would: a mapping the
    * caller cannot view does not exist for them — applying it would leak
    * a private mapping's transforms/filters through the preview's
    * validation output (round-14 self-review). */
  private def visibleMapping(id: Option[String],
                             user: Option[String]): Option[ETLMapping] =
    id.flatMap(SpecStore.loadMappings(mappingsPath).get).filter { m =>
      !authOn ||
        Accounts.canView(Accounts.loadAcls(aclPath), loadTeams(), m.id, user)
    }

  private def preview(ex: HttpExchange, sourceId: String, filename: String,
                      user: Option[String]): Unit =
    withSourceFile(ex, sourceId, filename) { (source, path) =>
      val mapping = visibleMapping(queryParams(ex).get("mapping_id"), user)
      val p = Api.preview(spark, path, source, mapping, n = Int.MaxValue)
      val columns = source.columns.map(_.name).toList
      val rows = p.rows.map(r => VectorMap[String, Any]("_line" -> r.line) ++
        columns.map(c => c -> r.cells.getOrElse(c, ""))).toList
      val validation = p.result.map(r => VectorMap[String, Any](
        "success_count" -> r.successCount, "skipped_count" -> r.skippedCount,
        "error_count" -> r.errorCount, "logs" -> Nil))
      respond(ex, 200, VectorMap[String, Any](
        "columns" -> columns,
        "rows" -> rows,
        "total" -> rows.length.toLong,
        "errors_by_line" -> p.errorsByLine.toList.sortBy(_._1)
          .map { case (line, es) => line.toString -> errorDicts(es) }
          .to(VectorMap),
        "validation" -> validation.orNull))
    }

  private def update(ex: HttpExchange, sourceId: String, filename: String,
                     user: Option[String]): Unit =
    withSourceFile(ex, sourceId, filename) { (_, path) =>
      val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
      (data.get("line"), data.get("row")) match {
        // the reference 400s on falsy values: line 0 or an empty row dict
        case (Some(line: Long), Some(row: Map[_, _]))
            if line != 0 && row.nonEmpty =>
          RowEdit.updateRow(path, line.toInt,
            row.asInstanceOf[Map[String, Any]].map { case (k, v) =>
              // JSON null -> empty cell (DictWriter writes None as '')
              k -> (if (v == null) "" else String.valueOf(v)) }) match {
            case Right(_) =>
              // audited AFTER the edit lands (round-13 advice: events must
              // record actions that actually happened)
              audit(user, "row_update", s"$sourceId/$filename")
              respond(ex, 200, VectorMap(
                "success" -> true, "message" -> s"Row $line updated"))
            case Left(m) => err(ex, 500, m)
          }
        case _ => err(ex, 400, "Missing line number or row data")
      }
    }

  /** Mapping resolution for convert/process: visibility-gated like the
    * preview's (a private mapping must not be runnable by id — its
    * transforms/filters and outputs would leak; round-14 self-review);
    * an invisible mapping answers the same 404 as a missing one. */
  private def withMappingDest(ex: HttpExchange, mappingId: Option[String],
                              user: Option[String])
                             (body: (ETLMapping, FileSpec) => Unit): Unit =
    visibleMapping(mappingId, user) match {
      case None => err(ex, if (mappingId.isEmpty) 400 else 404,
        if (mappingId.isEmpty) "Missing mapping_id" else "Mapping not found")
      case Some(m) =>
        SpecStore.loadFileSpecs(destinationsPath).get(m.destinationId) match {
          case None => err(ex, 404, "Destination not found")
          case Some(d) => body(m, d)
        }
    }

  private def convertOne(source: FileSpec, path: String, mapping: ETLMapping,
                         destination: FileSpec): (TransformResult, String) = {
    val stem = Paths.get(path).getFileName.toString.stripSuffix(".csv")
    val outDir = Paths.get(outputDir, destination.defaultDirectory)
    Files.createDirectories(outDir)
    val outFile = outDir.resolve(s"${stem}_${destination.id}.csv")
    (Api.convert(spark, path, source, mapping, outFile.toString,
      failOnError = true), outFile.getFileName.toString)
  }

  private def convert(ex: HttpExchange, sourceId: String, filename: String,
                      user: Option[String]): Unit =
    withSourceFile(ex, sourceId, filename) { (source, path) =>
      val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
      val mappingId = data.get("mapping_id").map(String.valueOf)
      withMappingDest(ex, mappingId, user) { (mapping, destination) =>
        val startedAt = clock()
        val (result, outName) = convertOne(source, path, mapping, destination)
        recordRun("convert", mapping, path,
          if (result.written) Some(outName) else None, result, startedAt)
        // audited AFTER the convert actually ran — a 404'd source/mapping
        // or an unparseable body leaves no event; the error-gated outcome
        // is named so the trail is usable as evidence (round-13 advice)
        audit(user, if (result.errorCount > 0) "convert_failed" else "convert",
          s"$sourceId/$filename")
        if (result.errorCount > 0)
          respond(ex, 400, VectorMap[String, Any](
            "success" -> false,
            "message" -> s"Conversion failed with ${result.errorCount} errors",
            "errors" -> result.errors.take(20).map(e => VectorMap[String, Any](
              "line" -> e.line_number, "field" -> e.field,
              "message" -> e.error_message)).toList,
            "logs" -> Nil))
        else
          respond(ex, 200, VectorMap[String, Any](
            "success" -> true,
            "message" -> s"Successfully converted ${result.successCount} records",
            "output_file" -> outName,
            "logs" -> Nil))
      }
    }

  /** app.py:161-231 — run every *.csv in the source directory through the
    * mapping; aggregate counts and per-file error context. */
  private def process(ex: HttpExchange, sourceId: String,
                      user: Option[String]): Unit = {
    val data = SpecStore.parseAny(readBody(ex)).asInstanceOf[Map[String, Any]]
    val mappingId = data.get("mapping_id").map(String.valueOf)
    withMappingDest(ex, mappingId, user) { (mapping, destination) =>
      SpecStore.loadFileSpecs(sourcesPath).get(mapping.sourceId) match {
        case None => err(ex, 404, "Invalid source or destination in mapping")
        case Some(source) =>
          val dir = Paths.get(inputDir, source.defaultDirectory)
          val files =
            if (Files.isDirectory(dir)) {
              val stream = Files.list(dir)
              try stream.iterator.asScala
                .filter(_.getFileName.toString.endsWith(".csv"))
                .toSeq.sortBy(_.toString)
              finally stream.close()
            } else Nil
          val columns = source.columns.map(_.name)
          var (success, skipped, errors) = (0L, 0L, 0L)
          val allErrors = List.newBuilder[VectorMap[String, Any]]
          // run-history: accumulate DEFERRED record builders per file and
          // append them in one locked batch after the loop — one load+save
          // for the whole batch (a per-file read-modify-write would be
          // O(files × history), round-12 review) with ids allocated
          // atomically at the store (round-12 verdict item 6)
          val runBuilders = List.newBuilder[Int => graft.spec.RunRecord]
          // persist whatever accumulated even if a later file's convert
          // throws (round-12 advice): completed files' run records must
          // survive a mid-batch failure like the single-file endpoint's do
          try files.foreach { f =>
            val startedAt = clock()
            val (r, outName) = convertOne(source, f.toString, mapping, destination)
            val finishedAt = clock()
            runBuilders += (from => runRecordOf(from, "process", mapping,
              f.toString, if (r.written) Some(outName) else None, r,
              startedAt, finishedAt))
            success += r.successCount; skipped += r.skippedCount
            errors += r.errorCount
            // reference app.py:209 carries the raw row dict per error;
            // RowError stores only the line number, so errored files get
            // one re-read to rebuild line → cells (header order)
            val rowsByLine: Map[Long, Map[String, String]] =
              if (r.errors.isEmpty) Map.empty
              else Api.preview(spark, f.toString, source, None, n = Int.MaxValue)
                .rows.map(pr => pr.line -> pr.cells).toMap
            r.errors.foreach { e =>
              val cells = rowsByLine.getOrElse(e.line_number, Map.empty)
              allErrors += VectorMap[String, Any](
                "file" -> f.getFileName.toString, "line" -> e.line_number,
                "field" -> e.field, "message" -> e.error_message,
                "value" -> e.source_value,
                "row_data" -> columns.map(c => c -> cells.getOrElse(c, ""))
                  .to(VectorMap))
            }
          }
          finally SpecStore.appendRunsNext(runsPath, runBuilders.result())
          // audited AFTER the batch ran (round-13 advice); failed files
          // are visible through their run records, so one event suffices
          audit(user, "process", sourceId)
          val errList = allErrors.result()
          // divergence note: the reference also carries per-file log lines;
          // this engine keeps counts + errors only
          respond(ex, 200, VectorMap[String, Any](
            "mapping_name" -> mapping.name,
            "success_count" -> success,
            "skipped_count" -> skipped,
            "error_count" -> errors,
            "errors" -> errList.take(50),
            "logs" -> Nil,
            "has_more_errors" -> (errList.length > 50)))
      }
    }
  }
}
