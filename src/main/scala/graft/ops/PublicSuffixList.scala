package graft.ops

import org.apache.spark.unsafe.types.UTF8String

/** Embedded snapshot of the Public Suffix List (publicsuffix.org) and the
  * PSL registrable-domain algorithm — the fold behind
  * [[CorpusOps.registrableDomain]].
  *
  * Why a real PSL and not the two-label eTLD+1 approximation (the r14
  * verdict's top finding): the fold keys the leakage-critical q236
  * domain-disjoint train/val split, the q242 per-domain cap, the q237
  * mixture reweight, the q231 blocklist, and the streaming domain
  * ledger. Under a last-two-labels fold every `.co.uk` / `.com.au` /
  * `.co.jp` site collapses into ONE "domain": the split stays
  * leakage-safe (coarser, never straddling) but the cap silently drops
  * most of a ccTLD's web to the cap size, the reweighter treats a
  * country as one publisher, and a blocklist entry normalizing to
  * `co.uk` nukes a country's corpus.
  *
  * The embedded list is a VERSIONED subset of the public list —
  * ICANN-section rules for the major gTLDs and ccTLD second-level
  * registries plus the canonical wildcard/exception pairs and the
  * highest-traffic private-section hosting suffixes. It is data, not
  * code: [[version]] stamps every persisted artifact keyed by the fold
  * (the domain ledger — mixed-version reads fail loudly), and the
  * DuckDB oracle replays the SAME sets as inline IN-lists
  * (graft.analytics.PslSql), so engine and oracle share one source of
  * truth. A fuller list drops into these three sets without touching
  * the algorithm or any caller.
  *
  * Algorithm (publicsuffix.org/list/ spec):
  *  1. normalize: lowercase; strip one trailing `:port`; hosts with bad
  *     label syntax, fewer than two labels, or an all-digit final label
  *     (IPv4 and friends — no TLD is numeric) quarantine to '' (the
  *     caller convention, never a throw).
  *  2. among rules whose labels are a suffix of the host's labels
  *     (`*` matching exactly one label), an EXCEPTION rule prevails and
  *     its public suffix is the rule minus its leftmost label;
  *     otherwise the rule with the most labels prevails; if none match
  *     the prevailing rule is `*` (one label) — which degrades exactly
  *     to the old two-label fold for unknown TLDs, the documented
  *     no-list fallback.
  *  3. the registrable domain is the public suffix plus one more host
  *     label; a host that IS a public suffix quarantines to ''.
  */
object PublicSuffixList {

  /** Stamped into every fold-keyed persisted artifact. Bump when the
    * embedded sets change — the domain ledger refuses mixed versions. */
  val version: String = "psl-embedded-2025.01-v1"

  /** Exact rules (ICANN + private sections, one string per rule). */
  val exact: Set[String] = Set(
    // generic TLDs
    "com", "net", "org", "io", "dev", "app", "info", "biz", "edu", "gov",
    "mil", "int", "co", "me", "tv", "cc", "ai", "xyz", "online", "site",
    "top", "club", "shop", "blog", "cloud", "us", "eu",
    // ccTLDs with flat registration
    "de", "fr", "it", "nl", "es", "se", "no", "fi", "dk", "ch", "at",
    "be", "pl", "pt", "gr", "cz", "ie", "ca", "ru", "jp", "cn", "in",
    "kr", "mx", "ar", "tr", "il", "sg", "hk", "tw", "th", "id", "ua",
    "uk", "au", "nz", "za", "br",
    // ccTLD second-level registries (the class the two-label fold broke)
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "co.id", "or.id", "net.id", "web.id", "ac.id", "go.id",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.co", "net.co", "org.co", "edu.co", "gov.co",
    // private-section hosting suffixes (user-content boundaries: two
    // GitHub Pages users must not count as one domain)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "herokuapp.com", "appspot.com", "cloudfront.net", "azurewebsites.net",
    "netlify.app", "vercel.app", "web.app", "pages.dev", "workers.dev",
    "wordpress.com", "s3.amazonaws.com",
  )

  /** Wildcard rules, stored as the parent (the rule minus `*.`):
    * `*.ck` → "ck". A suffix of parent+1 labels is a public suffix. */
  val wildcardParents: Set[String] = Set(
    "ck",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
  )

  /** Exception rules (stored without the `!`): a matching exception
    * prevails over every other rule and its public suffix is the rule
    * minus its leftmost label — `!www.ck` makes `www.ck` registrable. */
  val exceptions: Set[String] = Set(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
  )

  /** Deepest rule, in labels, any set — bounds the suffix walk. */
  val maxRuleLabels: Int = (
    exact.iterator.map(labelCount) ++
    wildcardParents.iterator.map(labelCount(_) + 1) ++
    exceptions.iterator.map(labelCount)
  ).max

  private def labelCount(s: String): Int = s.count(_ == '.') + 1

  private def validLabel(l: String): Boolean =
    l.nonEmpty && l.forall(c =>
      c == '-' || (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z'))

  /** The fold on a plain string. Never throws; quarantines to "". */
  def registrable(host: String): String = {
    var h = host.toLowerCase(java.util.Locale.ROOT)
    val ci = h.lastIndexOf(':')
    if (ci >= 0) {
      // strip one trailing :port; any other colon is not a hostname
      if (ci < h.length - 1 &&
          h.substring(ci + 1).forall(c => c >= '0' && c <= '9'))
        h = h.substring(0, ci)
      else return ""
    }
    if (h.isEmpty || h.charAt(0) == '.' || h.charAt(h.length - 1) == '.')
      return ""
    val labels = h.split('.')
    val n = labels.length
    if (n < 2 || !labels.forall(validLabel)) return ""
    // no TLD is numeric: all-digit final label = IPv4/garbage
    if (labels(n - 1).forall(c => c >= '0' && c <= '9')) return ""
    var psLen = 1 // the default `*` rule: unknown TLD → two-label fold
    var excLen = -1
    val maxK = math.min(n, maxRuleLabels)
    var k = 1
    while (k <= maxK) {
      val sfx = labels.slice(n - k, n).mkString(".")
      if (exceptions.contains(sfx)) excLen = k - 1
      if (exact.contains(sfx) && k > psLen) psLen = k
      if (wildcardParents.contains(sfx) && n >= k + 1 && k + 1 > psLen)
        psLen = k + 1
      k += 1
    }
    if (excLen >= 0) psLen = excLen // an exception prevails over all
    if (n <= psLen) "" // the host IS a public suffix
    else labels.slice(n - psLen - 1, n).mkString(".")
  }

  /** UTF8String surface for codegen ([[graft.functions.RegistrableDomainExpr]]). */
  def fold(host: UTF8String): UTF8String =
    UTF8String.fromString(registrable(host.toString))
}
