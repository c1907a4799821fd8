package graft.pipeline

import org.apache.spark.sql.DataFrame

import graft.analyze.Findings

/** Minimal HTML findings report (SURVEY §2.4 A5/A11, §2.6 T2): severity
  * card grid + severity-ordered findings table, rendered from the
  * rollup DataFrames (all aggregation happens in Spark; only the final
  * small rollups are collected).
  */
object HtmlReport {

  private def esc(s: String): String =
    Option(s).getOrElse("")
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      // values land in attribute context too (class="sev-..."): quotes
      // must not break out of the attribute
      .replace("\"", "&quot;").replace("'", "&#39;")

  def render(findings: DataFrame, title: String, topN: Int = 100): String = {
    val sevCounts = Findings.severityCounts(findings).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val domCounts = Findings.domainCounts(findings).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val top = Findings.topFindings(findings, topN)
      .select("severity", "domain", "title", "resource", "source").collect()

    val cards = sevCounts.map { case (s, n) =>
      s"""<div class="card sev-${esc(s)}"><div class="n">$n</div><div class="l">${esc(s)}</div></div>"""
    }.mkString("\n")
    val domRows = domCounts.map { case (d, n) => s"<tr><td>${esc(d)}</td><td>$n</td></tr>" }.mkString("\n")
    val rows = top.map { r =>
      val cells = (0 until 5).map(i => s"<td>${esc(r.getString(i))}</td>").mkString
      s"<tr class=\"sev-${esc(r.getString(0))}\">$cells</tr>"
    }.mkString("\n")

    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>
       |body{font-family:sans-serif;margin:2em}
       |.cards{display:flex;gap:1em}
       |.card{padding:1em;border-radius:8px;background:#eee;min-width:6em;text-align:center}
       |.card .n{font-size:2em;font-weight:bold}
       |.sev-critical{background:#fdd}.sev-high{background:#fed}.sev-medium{background:#ffd}
       |table{border-collapse:collapse;margin-top:1em}
       |td,th{border:1px solid #ccc;padding:4px 8px;text-align:left}
       |</style></head><body>
       |<h1>${esc(title)}</h1>
       |<div class="cards">$cards</div>
       |<h2>Findings by domain</h2>
       |<table><tr><th>domain</th><th>count</th></tr>$domRows</table>
       |<h2>Top findings</h2>
       |<table><tr><th>severity</th><th>domain</th><th>title</th><th>resource</th><th>source</th></tr>
       |$rows
       |</table></body></html>""".stripMargin
  }

  def write(findings: DataFrame, title: String, path: String, topN: Int = 100): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(findings, title, topN))
}
