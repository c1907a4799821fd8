package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization and domain extraction for web-corpus curation —
  * the C4/RefinedWeb hygiene step between crawl ingest and dedup:
  * tracking-parameter noise makes byte-identical pages look distinct
  * (defeating [[graft.operators.Dedup]]'s exact gate), and corpus
  * policy filters are written against REGISTRABLE domains, not raw
  * hosts. (Beyond-reference operator: the reference has no web-crawl
  * surface; the shapes follow the public C4 / RefinedWeb / CCNet
  * pipeline descriptions.)
  *
  * Everything here is a pure `Column` expression over one regex parse
  * of the URL — no UDF, no driver round trip — and every
  * transformation is DuckDB-replayable string algebra, so the c13
  * oracle gates the whole pipeline bit-for-bit.
  *
  * DELIBERATELY A NORMALIZER, NOT AN RFC 3986 PARSER: the goal is a
  * stable canonical form for dedup/filter keys, so userinfo is
  * lowercased with the rest of the authority, IDN/punycode is left
  * as-is, and percent-encoding is untouched. A string without a
  * `scheme://authority` shape normalizes to NULL — honest-null like
  * every parse surface here — and a null/invalid URL yields null
  * domain/flags downstream.
  *
  * The HOF `filter` in the query-parameter strip is interpreted (not
  * codegen), but its lambda touches only its own element and literal
  * regexes — the [[Text]] shingle trap (outer-expression re-eval per
  * element) does not apply.
  */
object Urls {

  /** Query parameters that carry tracking noise, not content — the
    * published C4-style strip list: utm_* (Google Analytics), click
    * ids (gclid/fbclid/msclkid), mail ids, share ids, bare `ref`.
    * Matched against the full `k=v` token (or bare `k`).
    */
  val TrackingParamRegex: String =
    "(?i)^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$"

  /** Multi-part public suffixes the [[registrableDomain]] heuristic
    * recognizes — the high-traffic subset (a full engine would ship
    * the public-suffix list as a broadcast table; the HEURISTIC is
    * documented as such and the oracle replays exactly this set).
    */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.nz", "co.in",
    "com.au", "net.au", "com.br", "com.cn", "com.mx", "com.tr",
    "com.ar", "com.sg")

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://.*$", 1))

  private def authorityOf(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$", 1))

  private def pathOf(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*$", 1)

  private def queryOf(u: Column): Column =
    regexp_extract(u, "^[^?]*\\?(.*)$", 1)

  /** Canonical form: fragment dropped; scheme + authority lowercased;
    * default port stripped (`:80` for http, `:443` for https); empty
    * path becomes `/`; tracking parameters removed from the query
    * (remaining parameters KEEP their order — reordering would merge
    * URLs whose servers treat order as significant); an emptied query
    * loses its `?`. NULL for null input and for anything without a
    * `scheme://authority` shape.
    */
  def normalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = schemeOf(u)
    val auth0 = authorityOf(u)
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path = when(pathOf(u) === "", lit("/")).otherwise(pathOf(u))
    val kept = array_join(
      filter(split(queryOf(u), "&"),
        t => t =!= "" && !t.rlike(TrackingParamRegex)), "&")
    val q = when(kept === "", lit("")).otherwise(concat(lit("?"), kept))
    when(url.isNull || scheme === "" || auth0 === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), auth, path, q))
  }

  /** The bare host of a URL: authority minus userinfo minus port,
    * lowercased. NULL on null/shapeless input.
    */
  def hostOf(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val auth = authorityOf(u)
    when(url.isNull || schemeOf(u) === "" || auth === "", lit(null).cast("string"))
      .otherwise(regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", ""))
  }

  /** Registrable (eTLD+1) domain of a host, under the
    * [[MultiPartTlds]] heuristic: the last two labels, or the last
    * three when the last two are a recognized multi-part public
    * suffix; a single-label host (localhost, intranet names) is its
    * own domain. NULL propagates.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(n >= 3 && last2.isin(MultiPartTlds: _*),
        concat_ws(".", element_at(labels, -3), last2))
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Blocklist membership on the REGISTRABLE domain (the policy-filter
    * key — blocking `spam.example` must catch `a.b.spam.example`).
    * The blocklist is a bounded literal/broadcast set by contract —
    * domain policy lists are thousands of entries, never corpus-sized.
    */
  def isBlockedDomain(url: Column, blocked: Seq[String]): Column = {
    val d = registrableDomain(hostOf(url))
    when(d.isNull, lit(null).cast("boolean")).otherwise(d.isin(blocked: _*))
  }
}
