package graft.ops

/** Embedded bad-word list for the C4 page filter ([[CorpusOps
  * .c4PageClean]]) — the "Dirty, Naughty, Obscene or Otherwise Bad
  * Words" rule of Raffel et al. 2020 §2.2, whose published pipeline
  * uses the public LDNOOBW English list (github.com/LDNOOBW).
  *
  * Like [[PublicSuffixList]] this is DATA, not code: a versioned,
  * curated single-word subset of the public list (the container build
  * has no network egress to pull the full ~400-entry snapshot; the full
  * list drops into [[words]] without touching any caller — multiword
  * entries would join as a lowercase-substring leg next to the token
  * test). [[version]] is stamped nowhere persistent today but exists so
  * any future filtered-corpus artifact can record which list dropped
  * its pages, the PSL-version lesson.
  *
  * Matching rule (documented, replayed verbatim by the DuckDB oracle
  * from THIS set): a page hits iff any token of the lowercased text —
  * tokens split on non-alphanumeric runs, so punctuation never shields
  * a word — equals a list entry. Token equality, not substring: the
  * classic Scunthorpe false positive is exactly what substring matching
  * gets wrong on a web corpus.
  */
object BadWords {

  /** Stamp for filtered-corpus artifacts; bump when [[words]] changes. */
  val version: String = "ldnoobw-en-subset-2025.01-v1"

  /** Single-word entries, lowercase. */
  val words: Set[String] = Set(
    "anal", "anus", "arse", "ass", "asses", "asshole", "ballsack",
    "bastard", "bdsm", "bestiality", "bitch", "bitches", "blowjob",
    "blowjobs", "boner", "boob", "boobs", "bukkake", "butthole",
    "clit", "clitoris", "cock", "cocks", "coon", "creampie", "cum",
    "cumming", "cumshot", "cunnilingus", "cunt", "cunts", "deepthroat",
    "dick", "dicks", "dildo", "dildos", "dyke", "ecchi", "ejaculate",
    "ejaculation", "erotic", "erotism", "faggot", "fellatio", "femdom",
    "fisting", "fuck", "fucked", "fucker", "fucking", "fucks",
    "futanari", "gangbang", "genitals", "goatse", "handjob", "hentai",
    "homoerotic", "horny", "incest", "jailbait", "jerkoff", "jizz",
    "kike", "labia", "masturbate", "masturbation", "milf", "negro",
    "nigga", "nigger", "nipple", "nipples", "nude", "nudity", "orgasm",
    "orgy", "paedophile", "panties", "pedophile", "penis", "playboy",
    "porn", "porno", "pornography", "pussies", "pussy", "raping",
    "rapist", "rectum", "rimjob", "scat", "schlong", "scrotum", "semen",
    "sex", "sexo", "sexy", "shemale", "shit", "slut", "sluts", "smut",
    "sodomize", "sodomy", "spunk", "strapon", "threesome", "tits",
    "titties", "titty", "twat", "vagina", "viagra", "vulva", "wank",
    "whore", "whores", "xxx",
  )
}
