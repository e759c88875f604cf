package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-suffix-list registered-domain extraction — the production path
  * for [[UrlOps]]'s grouping rule (reference behavior: domain-level
  * curation wants `user1.github.io` and `user2.github.io` to be DIFFERENT
  * publishers, and `a.co.uk`/`b.co.uk` different registrants, while
  * `cdn.x.example.com` and `www.example.com` stay one).
  *
  * Implements the published PSL algorithm (publicsuffix.org/list/ —
  * public knowledge) over the standard rule forms:
  *   - plain rules (`co.uk`): the rule itself is a public suffix;
  *   - wildcard rules (`*.ck`): any single label in the starred position
  *     extends the base into a public suffix;
  *   - exception rules (`!www.ck`): the matched host's suffix is the rule
  *     MINUS its leftmost label, overriding any wildcard;
  *   - the implicit default rule `*`: an unmatched TLD is itself a public
  *     suffix.
  * Longest match wins; exceptions beat everything. Registered domain =
  * prevailing public suffix + one more label; a host that IS a public
  * suffix (or an IP literal) canonicalizes to itself.
  *
  * [[rules]] is the FULL published list (~9.5k rules, ICANN + private
  * sections), vendored verbatim as a classpath resource
  * (`graft/public_suffix_list.dat`, the file Debian ships from
  * publicsuffix.org) and parsed at class-init: comment/blank lines drop,
  * `!` marks an exception, `*.` marks a wildcard base, everything else is
  * a plain rule; a suffix string appearing under several roles carries an
  * OR-ed kind bitmask. IDN rules are kept in their published Unicode form
  * — they match Unicode hosts and simply never equal an ASCII candidate.
  * The DuckDB oracle twin reads the very same parsed Seq as a VALUES
  * relation, so the two engines can never drift. The join/CASE machinery
  * is generated from the parsed table's actual depth ([[MaxRuleLabels]]
  * stored labels → [[MaxSuffixLabels]]-label public suffixes, the
  * 5-label `s3.dualstack.<region>.amazonaws.com` family and the 4-label
  * `*.compute.amazonaws.com.cn` wildcard base being the deepest), so a
  * future list refresh that deepens a family regenerates correctly
  * instead of silently truncating.
  *
  * Scale: the rule table is ~250 KiB — ALWAYS a broadcast; the operator
  * adds [[MaxRuleLabels]] BroadcastHashJoins (one per candidate suffix
  * length) and zero shuffles, so the derived domain column costs per-row
  * work only and the downstream per-domain cap keeps its single
  * domain-keyed shuffle.
  */
object Psl {

  /** kind bitmask values (a suffix string can carry several roles). */
  val Plain = 1
  val Wild = 2 // stored WITHOUT the `*.` — the wildcard BASE
  val Exc = 4 // stored WITHOUT the `!`

  /** The rule table (suffix → kind bitmask), parsed from the vendored
    * published file. One row per distinct suffix string, kinds OR-ed. */
  val rules: Seq[(String, Int)] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "vendored public_suffix_list.dat missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val parsed =
      try {
        src.getLines()
          // a rule is the line up to the first whitespace (published
          // format); comments and blanks carry no rule
          .map(_.trim.takeWhile(c => !c.isWhitespace))
          .filter(l => l.nonEmpty && !l.startsWith("//"))
          .map { l =>
            if (l.startsWith("!")) (l.stripPrefix("!"), Exc)
            else if (l.startsWith("*.")) (l.stripPrefix("*."), Wild)
            else (l, Plain)
          }
          .toSeq
      } finally src.close()
    parsed.groupBy(_._1).view
      .mapValues(_.map(_._2).reduce(_ | _)).toSeq.sortBy(_._1)
  }

  /** Deepest stored rule string in labels — one equi-join per candidate
    * length up to this. 5 in the current published file. */
  val MaxRuleLabels: Int = rules.iterator
    .map(_._1.count(_ == '.') + 1).max

  /** Longest public suffix the table can produce: a plain rule IS its
    * suffix; a wildcard base of k labels yields a (k+1)-label suffix; an
    * exception of k labels yields k-1. Registered domains reach one more
    * label. 5 in the current published file. */
  val MaxSuffixLabels: Int = rules.iterator.map { case (s, kind) =>
    val k = s.count(_ == '.') + 1
    Seq(if ((kind & Plain) != 0) k else 0,
      if ((kind & Wild) != 0) k + 1 else 0,
      if ((kind & Exc) != 0) k - 1 else 0).max
  }.max

  /** Deepest exception rule in labels (3 in the current file) — bounds
    * the exception branches of [[pubLenCase]]. */
  private val maxExcLabels: Int = {
    val ks = rules.collect { case (s, kind) if (kind & Exc) != 0 =>
      s.count(_ == '.') + 1 }
    if (ks.isEmpty) 1 else ks.max
  }

  /** The rule table as a DataFrame — small enough to ALWAYS broadcast. */
  def lookupDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rules.toDF("suffix", "kind")
  }

  // ------------------------------------------------------- shared logic
  // All intermediate columns carry a `_psl_` prefix so the operator can
  // never clobber (or be captured by) a caller's columns, and the SAME
  // generated CASE text runs on both engines.

  /** The prevailing public-suffix length as a CASE over the per-length
    * match kinds — ONE generator serves Spark and DuckDB so the longest-
    * match precedence can never drift between a query and its twin.
    * Column contract: `_psl_n` = label count, `_psl_k1.._psl_k<R>` =
    * kind bitmask the candidate of that length matched (NULL = no
    * match), R = [[MaxRuleLabels]].
    * Precedence per the published algorithm: exceptions first (longest
    * wins; suffix = rule minus leftmost label), then the longest of
    * {plain k, wildcard base k-1}, default 1. A wildcard base matched
    * by the candidate of length k only counts when the host HAS a label
    * in the starred position (`_psl_n > k`) — the published `*.foo`
    * never matches the bare base `foo` itself (which, absent any other
    * rule, falls to the default-`*` branch like any unlisted host). */
  def pubLenCase: String = {
    def has(k: Int, bit: Int) = s"(coalesce(_psl_k$k, 0) & $bit) != 0"
    def wild(k: Int) = s"(${has(k, Wild)} AND _psl_n > $k)"
    val excBranches = (maxExcLabels to 2 by -1)
      .map(k => s"WHEN ${has(k, Exc)} THEN ${k - 1}")
    val lenBranches = (MaxSuffixLabels to 2 by -1).map { l =>
      val plain = if (l <= MaxRuleLabels) Some(has(l, Plain)) else None
      val wld = if (l - 1 <= MaxRuleLabels) Some(wild(l - 1)) else None
      s"WHEN ${(plain ++ wld).mkString(" OR ")} THEN $l"
    }
    (excBranches ++ lenBranches)
      .mkString("CASE ", "\n  ", "\n  ELSE 1 END")
  }

  /** Registered domain from (_psl_host, _psl_n, _psl_pub, _psl_c2..):
    * a host that IS a public suffix — or an IP literal, or unparseable —
    * stays itself. A wildcard whose starred label is the host's FIRST
    * label (n = pub) also lands in the stays-itself branch. */
  def registeredCase(ipCond: String): String = {
    val byPub = (1 until MaxSuffixLabels)
      .map(k => s"WHEN _psl_pub = $k THEN _psl_c${k + 1}")
      .mkString(" ")
    s"""CASE WHEN _psl_host = '' OR $ipCond THEN _psl_host
       |  WHEN _psl_n <= _psl_pub THEN _psl_host
       |  $byPub ELSE _psl_c${MaxSuffixLabels + 1} END""".stripMargin
  }

  // -------------------------------------------------------------- Spark

  /** Adds `outCol` = PSL registered domain of `urlCol` ('' when nothing
    * parses). Plan: per-row candidate derivation + [[MaxRuleLabels]]
    * broadcast joins against [[lookupDf]] — no shuffle. */
  def withRegisteredDomain(df: DataFrame, urlCol: String,
                           outCol: String): DataFrame = {
    val spark = df.sparkSession
    val lk = lookupDf(spark)
    def cand(k: Int): String = {
      val parts = (k to 1 by -1)
        .map(i => s"element_at(_psl_labels, -$i)").mkString(", '.', ")
      if (k == 1) parts else s"concat($parts)"
    }
    var out = df
      // the RAW host — the published algorithm is defined over the real
      // label sequence; a pre-stripped `www.` would erase the label the
      // `!www.ck`-class exception rules and private-suffix publisher
      // grouping (`www.github.io`) key on
      .withColumn("_psl_host", expr(UrlOps.rawHostExpr(urlCol)))
      .withColumn("_psl_labels", expr("split(_psl_host, '\\\\.')"))
      .withColumn("_psl_n", expr("size(_psl_labels)"))
    (1 to MaxSuffixLabels + 1).foreach { k =>
      out = out.withColumn(s"_psl_c$k",
        expr(s"IF(_psl_n >= $k, ${cand(k)}, CAST(NULL AS STRING))"))
    }
    (1 to MaxRuleLabels).foreach { k =>
      out = out.join(
        broadcast(lk.select(col("suffix").as(s"_psl_s$k"),
          col("kind").as(s"_psl_k$k"))),
        col(s"_psl_c$k") === col(s"_psl_s$k"), "left")
    }
    val ip =
      "_psl_host RLIKE '^[0-9.]+$' OR substring(_psl_host, 1, 1) = '['"
    out
      .withColumn("_psl_pub", expr(pubLenCase))
      .withColumn(outCol, coalesce(expr(registeredCase(ip)), lit("")))
      .drop((Seq("_psl_host", "_psl_labels", "_psl_n", "_psl_pub") ++
        (1 to MaxSuffixLabels + 1).map(k => s"_psl_c$k") ++
        (1 to MaxRuleLabels).map(k => s"_psl_s$k") ++
        (1 to MaxRuleLabels).map(k => s"_psl_k$k")): _*)
  }

  // ------------------------------------------------------------- DuckDB

  object sql {

    /** The rule table as an inline VALUES relation — THE SAME Seq the
      * Spark side broadcasts (~9.5k rows; suffix strings contain no
      * quotes or backslashes, asserted by UrlOpsSpec). */
    def valuesRelation: String =
      rules.map { case (s, k) => s"('$s', $k)" }.mkString(",\n    ")

    /** CTE chain deriving `domain` from a relation `src` carrying a URL
      * column (plus `carryCols`, forwarded). Terminal CTE:
      * `psl_dm(carryCols..., domain)`. Shape mirrors the Spark operator:
      * candidates, [[MaxRuleLabels]] LEFT JOINs against the rule VALUES,
      * longest-match CASE — [[Psl.pubLenCase]]/[[Psl.registeredCase]]
      * verbatim. */
    def domainCtes(src: String, urlExpr: String,
                   carryCols: Seq[String]): String = {
      val carry = carryCols.mkString(", ")
      def cand(k: Int): String = {
        val parts = (k to 1 by -1)
          .map(i => s"_psl_labels[-$i]").mkString(", '.', ")
        if (k == 1) parts else s"concat($parts)"
      }
      val cands = (1 to MaxSuffixLabels + 1)
        .map(k => s"CASE WHEN _psl_n >= $k THEN ${cand(k)} END AS _psl_c$k")
        .mkString(",\n    ")
      val joins = (1 to MaxRuleLabels)
        .map(k => s"LEFT JOIN psl_rules p$k ON c._psl_c$k = p$k.suffix")
        .mkString("\n  ")
      val kinds = (1 to MaxRuleLabels)
        .map(k => s"p$k.kind AS _psl_k$k").mkString(", ")
      val ip = "regexp_matches(_psl_host, '^[0-9.]+$') " +
        "OR substring(_psl_host, 1, 1) = '['"
      s"""psl_rules(suffix, kind) AS (VALUES
         |    $valuesRelation
         |), psl_h AS (
         |  SELECT $carry, ${UrlOps.sql.rawHost(urlExpr)} AS _psl_host
         |  FROM $src
         |), psl_l AS (
         |  SELECT *, string_split(_psl_host, '.') AS _psl_labels,
         |    len(string_split(_psl_host, '.')) AS _psl_n
         |  FROM psl_h
         |), psl_c AS (
         |  SELECT $carry, _psl_host, _psl_n,
         |    $cands
         |  FROM psl_l
         |), psl_k AS (
         |  SELECT c.*, $kinds
         |  FROM psl_c c
         |  $joins
         |), psl_p AS (
         |  SELECT *, ${Psl.pubLenCase} AS _psl_pub FROM psl_k
         |), psl_dm AS (
         |  SELECT $carry,
         |    COALESCE(${Psl.registeredCase(ip)}, '') AS domain
         |  FROM psl_p
         |)""".stripMargin
    }
  }
}
