package graft.http

import graft.spec.{ETLMapping, FileSpec, RunRecord}

/** Server-rendered HTML over the dashboard state — the reference's primary
  * UX (app.py:53-101 index, :237-448 spec/mapping pages, :492-513 preview;
  * templates/). Original minimal markup, not a template port: each page is
  * a pure function of the SpecStore state the JSON API already serves, so
  * the HTML layer adds browse-ability without owning any logic. Forms post
  * to the existing routes; the visual editor page embeds the mapping state
  * the /api/mappings/{id}/save endpoint consumes.
  */
object Pages {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def page(title: String, body: String): String =
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)} — graft</title>
       |<style>
       |body{font-family:sans-serif;margin:2rem;max-width:60rem}
       |table{border-collapse:collapse}td,th{border:1px solid #999;padding:.3rem .6rem}
       |nav a{margin-right:1rem}
       |body.dark{background:#121212;color:#ddd}
       |body.dark a{color:#8ab4f8}
       |body.dark td,body.dark th{border-color:#555}
       |</style></head><body>
       |<nav><a href="/">Home</a><a href="/sources">Sources</a>
       |<a href="/destinations">Destinations</a><a href="/mappings">Mappings</a></nav>
       |<h1>${esc(title)}</h1>
       |$body
       |</body></html>""".stripMargin

  /** Per-user dashboard (ROADMAP.md:76 "User dashboard with owned and
    * shared resources"): each store's ids grouped by the requester's
    * relationship — owned, shared-with-me, public/discoverable. */
  def meDashboard(name: String,
                  kinds: Seq[(String, Seq[String], Seq[String], Seq[String])])
      : String = {
    def cell(ids: Seq[String]) =
      if (ids.isEmpty) "<em>none</em>" else esc(ids.mkString(", "))
    val rows = kinds.map { case (kind, owned, shared, pub) =>
      s"""<tr><th>${esc(kind)}</th><td>${cell(owned)}</td>
         |<td>${cell(shared)}</td><td>${cell(pub)}</td></tr>""".stripMargin
    }.mkString
    page(s"$name's resources",
      s"""<table><tr><th></th><th>Owned</th><th>Shared with me</th>
         |<th>Public</th></tr>$rows</table>""".stripMargin)
  }

  /** Dashboard home: every source with its input files and applicable
    * mappings, every destination with its output files. */
  def index(sources: Map[String, FileSpec],
            destinations: Map[String, FileSpec],
            mappings: Map[String, ETLMapping],
            sourceFiles: Map[String, Seq[String]],
            outputFiles: Map[String, Seq[String]]): String = {
    def fileList(fs: Seq[String], linkBase: Option[String]) =
      if (fs.isEmpty) "<em>no files</em>"
      else "<ul>" + fs.map { f =>
        linkBase match {
          case Some(b) => s"""<li><a href="$b/${esc(f)}">${esc(f)}</a></li>"""
          case None => s"<li>${esc(f)}</li>"
        }
      }.mkString + "</ul>"
    val srcRows = sources.toSeq.sortBy(_._1).map { case (id, s) =>
      val maps = mappings.values.filter(_.sourceId == id)
        .map(m => s"""<a href="/mappings/${esc(m.id)}/visual">${esc(m.name)}</a>""")
        .mkString(", ")
      s"""<tr><td><a href="/sources">${esc(id)}</a></td><td>${esc(s.name)}</td>
         |<td>${fileList(sourceFiles.getOrElse(id, Nil), None)}</td>
         |<td>$maps</td></tr>""".stripMargin
    }.mkString
    val dstRows = destinations.toSeq.sortBy(_._1).map { case (id, d) =>
      s"""<tr><td>${esc(id)}</td><td>${esc(d.name)}</td>
         |<td>${fileList(outputFiles.getOrElse(id, Nil), Some("/download"))}</td></tr>""".stripMargin
    }.mkString
    page("Dashboard",
      s"""<h2>Sources</h2>
         |<table><tr><th>id</th><th>name</th><th>input files</th><th>mappings</th></tr>$srcRows</table>
         |<h2>Destinations</h2>
         |<table><tr><th>id</th><th>name</th><th>output files</th></tr>$dstRows</table>""".stripMargin)
  }

  /** Spec list page (sources or destinations — same shape). */
  def specList(specType: String, specs: Map[String, FileSpec]): String = {
    val rows = specs.toSeq.sortBy(_._1).map { case (id, s) =>
      s"""<tr><td>${esc(id)}</td><td>${esc(s.name)}</td>
         |<td>${s.columns.length}</td><td>${esc(s.defaultDirectory)}</td></tr>""".stripMargin
    }.mkString
    page(s"${specType.capitalize}s",
      s"""<table><tr><th>id</th><th>name</th><th>columns</th><th>directory</th></tr>$rows</table>""")
  }

  /** Mapping list page. */
  def mappingList(mappings: Map[String, ETLMapping]): String = {
    val rows = mappings.toSeq.sortBy(_._1).map { case (id, m) =>
      s"""<tr><td>${esc(id)}</td><td>${esc(m.name)}</td>
         |<td>${esc(m.sourceId)}</td><td>${esc(m.destinationId)}</td>
         |<td>${m.fieldMappings.length}</td>
         |<td><a href="/mappings/${esc(id)}/visual">visual editor</a></td></tr>""".stripMargin
    }.mkString
    page("Mappings",
      s"""<table><tr><th>id</th><th>name</th><th>source</th><th>destination</th>
         |<th>fields</th><th></th></tr>$rows</table>""".stripMargin)
  }

  /** D6 template-library page: saved mapping templates with their shape
    * and the instantiate endpoint each one answers to. */
  def templateList(templates: Map[String, ETLMapping]): String = {
    val rows = templates.toSeq.sortBy(_._1).map { case (id, t) =>
      s"""<tr><td>${esc(id)}</td><td>${esc(t.name)}</td>
         |<td>${t.fieldMappings.length}</td><td>${t.filterRules.length}</td>
         |<td><code>POST /api/templates/${esc(id)}/instantiate</code></td></tr>""".stripMargin
    }.mkString
    page("Mapping templates",
      s"""<table><tr><th>id</th><th>name</th><th>fields</th><th>filters</th>
         |<th>instantiate</th></tr>$rows</table>""".stripMargin)
  }

  /** D5 run-history page: every recorded convert/process run, newest last
    * (store order = append order), with its mapping name and counters. */
  def runList(runs: Map[String, RunRecord],
              mappings: Map[String, ETLMapping]): String = {
    val rows = runs.toSeq.map { case (id, r) =>
      val mname = mappings.get(r.mappingId).map(_.name).getOrElse(r.mappingId)
      s"""<tr><td>${esc(id)}</td><td>${esc(r.kind)}</td><td>${esc(mname)}</td>
         |<td>${esc(r.inputFile)}</td><td>${esc(r.outputFile.getOrElse(""))}</td>
         |<td>${r.successCount}</td><td>${r.skippedCount}</td><td>${r.errorCount}</td>
         |<td>${if (r.written) "yes" else "no"}</td>
         |<td>${esc(r.startedAt)}</td><td>${esc(r.finishedAt)}</td></tr>""".stripMargin
    }.mkString
    page("Run history",
      s"""<table><tr><th>run</th><th>kind</th><th>mapping</th><th>input</th>
         |<th>output</th><th>ok</th><th>skipped</th><th>errors</th>
         |<th>written</th><th>started</th><th>finished</th></tr>$rows</table>""".stripMargin)
  }

  /** Visual mapping editor: source columns on the left, destination fields
    * with their configured transform on the right. The page embeds the
    * state the POST /api/mappings/{id}/save endpoint accepts. */
  def visualEditor(mapping: ETLMapping, source: Option[FileSpec]): String = {
    val srcCols = source.map(_.columns.map(c => s"<li>${esc(c.name)}</li>").mkString)
      .getOrElse("")
    val fmRows = mapping.fieldMappings.map { fm =>
      s"""<tr><td>${esc(fm.destinationField)}</td><td>${esc(fm.transformType)}</td>
         |<td>${esc(fm.sourceField.getOrElse(""))}</td></tr>""".stripMargin
    }.mkString
    val frRows = mapping.filterRules.map { fr =>
      s"""<tr><td>${esc(fr.field)}</td><td>${esc(fr.operator)}</td></tr>""".stripMargin
    }.mkString
    page(s"Visual editor — ${mapping.name}",
      s"""<p>source <b>${esc(mapping.sourceId)}</b> → destination
         |<b>${esc(mapping.destinationId)}</b></p>
         |<h2>Source columns</h2><ul>$srcCols</ul>
         |<h2>Field mappings</h2>
         |<table><tr><th>target</th><th>transform</th><th>source field</th></tr>$fmRows</table>
         |<h2>Filter rules</h2>
         |<table><tr><th>field</th><th>rule</th></tr>$frRows</table>
         |<p>edits save via <code>POST /api/mappings/${esc(mapping.id)}/save</code></p>""".stripMargin)
  }

  /** New/edit form for a spec or mapping: one JSON editor posting back to
    * the same URL (re-expression of the reference's multi-field edit.html —
    * the payload IS the store schema, so the form edits it directly). */
  def editorForm(title: String, fieldName: String, json: String): String =
    page(title,
      s"""<form method="post">
         |<textarea name="$fieldName" rows="24" cols="100">${esc(json)}</textarea>
         |<br><button type="submit">Save</button></form>""".stripMargin)

  /** Server-rendered preview grid (reference preview.html): first rows of
    * the file with per-line error highlighting and, when a mapping was
    * applied, the validation counters. */
  def previewGrid(sourceId: String, filename: String, columns: Seq[String],
                  rows: Seq[(Long, Map[String, String])],
                  errorLines: Set[Long],
                  validation: Option[(Long, Long, Long)],
                  total: Long): String = {
    val head = ("line" +: columns).map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { case (line, cells) =>
      val style = if (errorLines(line)) """ style="background:#fdd"""" else ""
      s"<tr$style><td>$line</td>" +
        columns.map(c => s"<td>${esc(cells.getOrElse(c, ""))}</td>").mkString +
        "</tr>"
    }.mkString
    val summary = validation.map { case (ok, skip, err) =>
      s"<p>validation: <b>$ok</b> ok, <b>$skip</b> skipped, <b>$err</b> errors</p>"
    }.getOrElse("")
    page(s"Preview — $filename",
      s"""<p>file <b>${esc(filename)}</b> of source <b>${esc(sourceId)}</b>
         | — showing ${rows.length} of $total rows
         | (JSON: <code>/api/preview/${esc(sourceId)}/${esc(filename)}</code>)</p>
         |$summary
         |<table><tr>$head</tr>$body</table>""".stripMargin)
  }
}
