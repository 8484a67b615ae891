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
  * The embedded list is the FULL publicsuffix.org snapshot (r16 —
  * the r15 verdict's task 1; the curated ~190-rule subset it replaces
  * degraded `.co.ke`-class registries to the two-label fold), generated
  * into [[PslData]] by tools/gen_psl.py from the committed
  * tools/data/public_suffix_list.dat: ~9.4k exact rules, 107 wildcards,
  * 8 exceptions, ICANN + private sections, unicode labels converted to
  * punycode at generation time (the engine matches hosts in their ASCII
  * form — [[registrable]]'s label validator rejects raw non-ASCII, so
  * punycode is the form a rule can ever match). It is data, not code:
  * [[version]] stamps every persisted artifact keyed by the fold (the
  * domain ledger — mixed-version reads fail loudly; the version bump
  * that came with the full list exercises exactly that gate), and the
  * DuckDB oracle replays the SAME sets (graft.analytics.PslSql), so
  * engine and oracle share one source of truth.
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
    * embedded sets change — the domain ledger refuses mixed versions.
    * Carries the snapshot's sha256 prefix (see [[PslData]]). */
  val version: String = PslData.version

  /** Exact rules (ICANN + private sections, one string per rule). */
  val exact: Set[String] = PslData.exact

  /** Wildcard rules, stored as the parent (the rule minus `*.`):
    * `*.ck` → "ck". A suffix of parent+1 labels is a public suffix. */
  val wildcardParents: Set[String] = PslData.wildcardParents

  /** Exception rules (stored without the `!`): a matching exception
    * prevails over every other rule and its public suffix is the rule
    * minus its leftmost label — `!www.ck` makes `www.ck` registrable. */
  val exceptions: Set[String] = PslData.exceptions

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
