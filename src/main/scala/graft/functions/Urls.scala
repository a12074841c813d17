package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl curation — pure column
  * expressions (whole-stage codegen, no UDF), so the normalizer runs
  * at scan speed over a 100 TB crawl. The rules are the standard
  * crawl-dedup set (RFC 3986 §6 normalizations plus the tracking-param
  * strip every pipeline applies):
  *
  *  - drop the fragment (`#…` never reaches the server)
  *  - lowercase scheme and host; strip a leading `www.`
  *  - strip default ports (`:80` for http, `:443` for https)
  *  - drop tracking params (`utm_*`, `gclid`, `fbclid`),
  *    sort the survivors (param order is almost never semantic)
  *  - strip trailing slashes from the path
  *
  * Two URLs that canonicalize equal are retrieval-equivalent for
  * dedup purposes; the false-merge risk (a site where param ORDER
  * matters) is the documented trade every crawl dedup makes. `ref`
  * is NOT in the default strip set (r16 ADVICE): unlike `utm_`-
  * prefixed params, gclid, and fbclid it is commonly semantic — e.g.
  * a forge URL's `?ref=branch` selects different content — so
  * stripping it false-merges retrieval-distinct URLs; callers who
  * know their corpus uses `ref` as a referrer tag pass a wider set
  * via `trackingParamRe`.
  */
object Urls {

  /** Default tracking-param matcher (full `key=value` token): the
    * universally-safe strip set. Override per corpus. */
  val defaultTrackingRe = "^(utm_[^=]*|gclid|fbclid)(=.*)?$"

  def canonicalize(url: Column,
      trackingParamRe: String = defaultTrackingRe): Column = {
    val trackingRe = trackingParamRe
    val noFrag = regexp_replace(trim(url), "#.*", "")
    // scheme://host[:port] prefix; everything after is path[?query]
    val prefix0 = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val prefix = regexp_replace(
      regexp_replace(
        regexp_replace(prefix0, "://www\\.", "://"),
        "^(https://[^/:?#]*):443$", "$1"),
      "^(http://[^/:?#]*):80$", "$1")
    val rest = substring(noFrag, length(prefix0) + 1, lit(1 << 20))
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1),
      "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_join(
      sort_array(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(trackingRe))), "&")
    concat(prefix, path,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }
}
