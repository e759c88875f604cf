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
  * [[rules]] is a curated ~600-rule subset of the published list — every
  * multi-label ICANN registry rule family in wide crawl circulation (ccTLD
  * second-level registries, the JP prefecture/city geography including its
  * wildcard+exception city rules, CN provinces, US states) plus the
  * high-traffic private-section hosting suffixes (github.io, blogspot.*,
  * the amazonaws.com wildcards, the CentralNic de.com family). The full
  * published file drops into this ONE Seq without code changes — each line
  * maps 1:1 to a `(suffix, kind)` row — and the DuckDB oracle twin reads
  * the very same Seq as a VALUES relation, so the swap can never drift
  * between engines. Rules up to 3 labels (public suffixes up to 4) are
  * honored — the deepest rules that matter for registered-domain grouping;
  * [[MaxSuffixLabels]] pins the bound.
  *
  * Scale: the rule table is a few KiB — ALWAYS a broadcast; the operator
  * adds 4 BroadcastHashJoins (one per candidate suffix length) and zero
  * shuffles, so the derived domain column costs per-row work only and the
  * downstream per-domain cap keeps its single domain-keyed shuffle.
  */
object Psl {

  /** kind bitmask values (a suffix string can carry several roles). */
  val Plain = 1
  val Wild = 2 // stored WITHOUT the `*.` — the wildcard BASE
  val Exc = 4 // stored WITHOUT the `!`

  /** Longest public suffix this table can produce (wildcard base of 3
    * labels → 4-label suffix); registered domains reach 5 labels. */
  val MaxSuffixLabels = 4

  private def p(ss: String*): Seq[(String, Int)] = ss.map(_ -> Plain)
  private def w(ss: String*): Seq[(String, Int)] = ss.map(_ -> Wild)
  private def x(ss: String*): Seq[(String, Int)] = ss.map(_ -> Exc)

  /** The rule table (suffix → kind bitmask). Curated subset of the
    * published public-suffix list; see the object scaladoc for scope. */
  val rules: Seq[(String, Int)] = {
    val icann =
      // United Kingdom
      p("ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
        "org.uk", "plc.uk", "police.uk") ++ w("sch.uk") ++
      // Japan: registry second-levels, 47 prefectures, city wildcards
      p("ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
        "ne.jp", "or.jp") ++
      p("aichi.jp", "akita.jp", "aomori.jp", "chiba.jp", "ehime.jp",
        "fukui.jp", "fukuoka.jp", "fukushima.jp", "gifu.jp", "gunma.jp",
        "hiroshima.jp", "hokkaido.jp", "hyogo.jp", "ibaraki.jp",
        "ishikawa.jp", "iwate.jp", "kagawa.jp", "kagoshima.jp",
        "kanagawa.jp", "kochi.jp", "kumamoto.jp", "kyoto.jp", "mie.jp",
        "miyagi.jp", "miyazaki.jp", "nagano.jp", "nagasaki.jp", "nara.jp",
        "niigata.jp", "oita.jp", "okayama.jp", "okinawa.jp", "osaka.jp",
        "saga.jp", "saitama.jp", "shiga.jp", "shimane.jp", "shizuoka.jp",
        "tochigi.jp", "tokushima.jp", "tokyo.jp", "tottori.jp", "toyama.jp",
        "wakayama.jp", "yamagata.jp", "yamaguchi.jp", "yamanashi.jp") ++
      w("kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
        "sapporo.jp", "sendai.jp", "yokohama.jp") ++
      x("city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
        "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
        "city.yokohama.jp") ++
      // Australia / New Zealand
      p("asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au",
        "org.au") ++
      p("ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
        "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
        "org.nz", "parliament.nz", "school.nz") ++
      // Americas
      p("adv.br", "art.br", "blog.br", "com.br", "eco.br", "edu.br",
        "eng.br", "gov.br", "ind.br", "inf.br", "jus.br", "leg.br",
        "med.br", "mil.br", "net.br", "org.br", "rec.br", "srv.br",
        "tur.br", "tv.br", "wiki.br") ++
      p("com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
        "net.ar", "org.ar", "tur.ar") ++
      p("com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx") ++
      p("com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co",
        "org.co") ++
      p("com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
        "org.pe") ++
      p("gob.cl", "gov.cl", "mil.cl") ++
      p("com.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve", "net.ve",
        "org.ve", "web.ve") ++
      p("com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy") ++
      p("com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py",
        "org.py") ++
      p("com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo",
        "org.bo", "tv.bo") ++
      p("com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec",
        "k12.ec", "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec") ++
      p("ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr") ++
      p("com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt",
        "org.gt") ++
      p("art.do", "com.do", "edu.do", "gob.do", "gov.do", "mil.do",
        "net.do", "org.do", "sld.do", "web.do") ++
      p("ac.pa", "com.pa", "edu.pa", "gob.pa", "ing.pa", "med.pa",
        "net.pa", "nom.pa", "org.pa", "sld.pa") ++
      p("com.hn", "edu.hn", "gob.hn", "mil.hn", "net.hn", "org.hn") ++
      p("biz.ni", "co.ni", "com.ni", "edu.ni", "gob.ni", "in.ni",
        "info.ni", "int.ni", "mil.ni", "net.ni", "nom.ni", "org.ni",
        "web.ni") ++
      p("com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv") ++
      // Canada provinces + federal
      p("ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
        "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
        "yk.ca") ++
      // US states (the k12/cc/lib third-levels of the published list are
      // below the registered-domain grain this subset targets)
      p("ak.us", "al.us", "ar.us", "az.us", "ca.us", "co.us", "ct.us",
        "dc.us", "de.us", "fl.us", "ga.us", "hi.us", "ia.us", "id.us",
        "il.us", "in.us", "ks.us", "ky.us", "la.us", "ma.us", "md.us",
        "me.us", "mi.us", "mn.us", "mo.us", "ms.us", "mt.us", "nc.us",
        "nd.us", "ne.us", "nh.us", "nj.us", "nm.us", "nv.us", "ny.us",
        "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us", "sd.us",
        "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us", "wi.us",
        "wv.us", "wy.us") ++
      // South / Southeast / East Asia
      p("ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in",
        "ind.in", "mil.in", "net.in", "nic.in", "org.in", "res.in") ++
      p("ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn",
        "org.cn") ++
      p("ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
        "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hk.cn", "hl.cn",
        "hn.cn", "jl.cn", "js.cn", "jx.cn", "ln.cn", "mo.cn", "nm.cn",
        "nx.cn", "qh.cn", "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn",
        "tj.cn", "tw.cn", "xj.cn", "xz.cn", "yn.cn", "zj.cn") ++
      p("ac.kr", "busan.kr", "co.kr", "daegu.kr", "daejeon.kr", "es.kr",
        "go.kr", "gwangju.kr", "hs.kr", "incheon.kr", "kg.kr", "mil.kr",
        "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
        "ulsan.kr") ++
      p("com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw") ++
      p("com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk") ++
      p("com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg") ++
      p("ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
        "net.id", "or.id", "sch.id", "web.id") ++
      p("ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th") ++
      p("com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
        "org.my") ++
      p("com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "ngo.ph",
        "org.ph") ++
      p("ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
        "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn") ++
      p("biz.pk", "com.pk", "edu.pk", "fam.pk", "gov.pk", "net.pk",
        "org.pk", "web.pk") ++
      p("ac.lk", "assn.lk", "com.lk", "edu.lk", "gov.lk", "grp.lk",
        "hotel.lk", "int.lk", "ltd.lk", "net.lk", "ngo.lk", "org.lk",
        "sch.lk", "soc.lk", "web.lk") ++
      // Middle East / Africa
      p("ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
        "net.il", "org.il") ++
      p("av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr",
        "edu.tr", "gen.tr", "gov.tr", "info.tr", "k12.tr", "mil.tr",
        "name.tr", "net.tr", "org.tr", "pol.tr", "tel.tr", "tv.tr",
        "web.tr") ++
      p("ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae",
        "sch.ae") ++
      p("com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
        "pub.sa", "sch.sa") ++
      p("com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
        "net.eg", "org.eg", "sci.eg") ++
      p("ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir",
        "sch.ir") ++
      p("ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za",
        "net.za", "nom.za", "org.za", "school.za", "web.za") ++
      p("com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
        "name.ng", "net.ng", "org.ng", "sch.ng") ++
      p("ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
        "or.ke", "sc.ke") ++
      p("com.gh", "edu.gh", "gov.gh", "mil.gh", "org.gh") ++
      // Europe (beyond uk)
      p("com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
        "crimea.ua", "dnipropetrovsk.ua", "donetsk.ua", "kharkiv.ua",
        "kharkov.ua", "kiev.ua", "kyiv.ua", "lviv.ua", "odesa.ua",
        "odessa.ua") ++
      p("com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl", "org.pl",
        "waw.pl", "wroc.pl", "krakow.pl", "lodz.pl", "poznan.pl") ++
      p("com.ru", "msk.ru", "net.ru", "org.ru", "pp.ru", "spb.ru") ++
      p("com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr") ++
      p("ac.cy", "biz.cy", "com.cy", "gov.cy", "ltd.cy", "mil.cy",
        "net.cy", "org.cy", "press.cy", "pro.cy", "tm.cy") ++
      p("asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr") ++
      p("com.es", "edu.es", "gob.es", "nom.es", "org.es") ++
      p("edu.it", "gov.it") ++
      p("com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
        "org.pt", "publ.pt") ++
      p("arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro",
        "org.ro", "rec.ro", "store.ro", "tm.ro", "www.ro") ++
      p("co.hu", "info.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu") ++
      p("ac.at", "co.at", "gv.at", "or.at") ++
      p("ac.be", "gov.ie") ++
      p("com.is", "edu.is", "gov.is", "int.is", "net.is", "org.is") ++
      p("asn.lv", "com.lv", "conf.lv", "edu.lv", "gov.lv", "id.lv",
        "mil.lv", "net.lv", "org.lv") ++
      p("com.ee", "edu.ee", "gov.ee", "org.ee") ++
      p("ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs") ++
      p("com.hr", "from.hr", "iz.hr", "name.hr") ++
      p("com.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz", "org.kz") ++
      p("co.uz", "com.uz", "net.uz", "org.uz") ++
      // whole-TLD wildcards of the published list
      w("bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg", "ye") ++
      x("www.ck")
    val priv =
      // hosting / PaaS platforms where each subdomain is a distinct
      // publisher — the private section's reason to exist
      p("github.io", "githubusercontent.com", "gitlab.io",
        "wordpress.com", "tumblr.com", "weebly.com", "wixsite.com",
        "netlify.app", "vercel.app", "now.sh", "herokuapp.com",
        "appspot.com", "firebaseapp.com", "web.app", "pages.dev",
        "workers.dev", "r2.dev", "trycloudflare.com",
        "azurewebsites.net", "cloudapp.azure.com", "azurestaticapps.net",
        "onrender.com", "fly.dev", "deno.dev", "repl.co", "replit.app",
        "glitch.me", "neocities.org", "readthedocs.io", "surge.sh",
        "ngrok.io", "ngrok-free.app", "cloudfront.net",
        "cloudfunctions.net", "s3.amazonaws.com",
        "duckdns.org", "no-ip.com", "dyndns.org") ++
      w("compute.amazonaws.com", "compute-1.amazonaws.com",
        "elb.amazonaws.com") ++
      // blogspot's per-country domains (each blog a publisher)
      p("blogspot.com", "blogspot.ca", "blogspot.ch", "blogspot.cl",
        "blogspot.co.at", "blogspot.co.nz", "blogspot.co.uk",
        "blogspot.co.za", "blogspot.com.ar", "blogspot.com.au",
        "blogspot.com.br", "blogspot.com.es", "blogspot.com.mt",
        "blogspot.com.tr", "blogspot.de", "blogspot.dk", "blogspot.fi",
        "blogspot.fr", "blogspot.gr", "blogspot.hk", "blogspot.hu",
        "blogspot.ie", "blogspot.in", "blogspot.it", "blogspot.jp",
        "blogspot.kr", "blogspot.mx", "blogspot.nl", "blogspot.no",
        "blogspot.pt", "blogspot.ro", "blogspot.ru", "blogspot.se",
        "blogspot.sg", "blogspot.tw") ++
      // CentralNic pseudo-ccTLD second-levels (de.com et al.)
      p("ae.org", "ar.com", "br.com", "cn.com", "co.com", "de.com",
        "eu.com", "gb.net", "gr.com", "hu.com", "hu.net", "jpn.com",
        "kr.com", "mex.com", "no.com", "qc.com", "ru.com", "sa.com",
        "se.net", "uk.com", "uk.net", "us.com", "us.org", "uy.com",
        "za.bz", "za.com")
    // one row per suffix with kinds OR-ed — a string may carry several
    // roles once the full published list drops in
    (icann ++ priv).groupBy(_._1).view
      .mapValues(_.map(_._2).reduce(_ | _)).toSeq.sortBy(_._1)
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
    * Column contract: `_psl_n` = label count, `_psl_k1.._psl_k4` = kind
    * bitmask the candidate of that length matched (NULL = no match).
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
    s"""CASE WHEN ${has(4, Exc)} THEN 3
       |  WHEN ${has(3, Exc)} THEN 2
       |  WHEN ${has(2, Exc)} THEN 1
       |  WHEN ${has(4, Plain)} OR ${wild(3)} THEN 4
       |  WHEN ${has(3, Plain)} OR ${wild(2)} THEN 3
       |  WHEN ${has(2, Plain)} OR ${wild(1)} THEN 2
       |  ELSE 1 END""".stripMargin
  }

  /** Registered domain from (_psl_host, _psl_n, _psl_pub, _psl_c2..5): a
    * host that IS a public suffix — or an IP literal, or unparseable —
    * stays itself. A wildcard whose starred label is the host's FIRST
    * label (n = pub) also lands in the stays-itself branch. */
  def registeredCase(ipCond: String): String =
    s"""CASE WHEN _psl_host = '' OR $ipCond THEN _psl_host
       |  WHEN _psl_n <= _psl_pub THEN _psl_host
       |  WHEN _psl_pub = 1 THEN _psl_c2 WHEN _psl_pub = 2 THEN _psl_c3
       |  WHEN _psl_pub = 3 THEN _psl_c4 ELSE _psl_c5 END""".stripMargin

  // -------------------------------------------------------------- Spark

  /** Adds `outCol` = PSL registered domain of `urlCol` ('' when nothing
    * parses). Plan: per-row candidate derivation + 4 broadcast joins
    * against [[lookupDf]] — no shuffle. */
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
    (1 to 5).foreach { k =>
      out = out.withColumn(s"_psl_c$k",
        expr(s"IF(_psl_n >= $k, ${cand(k)}, CAST(NULL AS STRING))"))
    }
    (1 to 4).foreach { k =>
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
        (1 to 5).map(k => s"_psl_c$k") ++ (1 to 4).map(k => s"_psl_s$k") ++
        (1 to 4).map(k => s"_psl_k$k")): _*)
  }

  // ------------------------------------------------------------- DuckDB

  object sql {

    /** The rule table as an inline VALUES relation — THE SAME Seq the
      * Spark side broadcasts. */
    def valuesRelation: String =
      rules.map { case (s, k) => s"('$s', $k)" }.mkString(",\n    ")

    /** CTE chain deriving `domain` from a relation `src` carrying a URL
      * column (plus `carryCols`, forwarded). Terminal CTE:
      * `psl_dm(carryCols..., domain)`. Shape mirrors the Spark operator:
      * candidates, 4 LEFT JOINs against the rule VALUES, longest-match
      * CASE — [[Psl.pubLenCase]]/[[Psl.registeredCase]] verbatim. */
    def domainCtes(src: String, urlExpr: String,
                   carryCols: Seq[String]): String = {
      val carry = carryCols.mkString(", ")
      def cand(k: Int): String = {
        val parts = (k to 1 by -1)
          .map(i => s"_psl_labels[-$i]").mkString(", '.', ")
        if (k == 1) parts else s"concat($parts)"
      }
      val cands = (1 to 5)
        .map(k => s"CASE WHEN _psl_n >= $k THEN ${cand(k)} END AS _psl_c$k")
        .mkString(",\n    ")
      val joins = (1 to 4)
        .map(k => s"LEFT JOIN psl_rules p$k ON c._psl_c$k = p$k.suffix")
        .mkString("\n  ")
      val kinds = (1 to 4).map(k => s"p$k.kind AS _psl_k$k").mkString(", ")
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
