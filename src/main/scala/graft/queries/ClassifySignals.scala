package graft.queries

/** Single source of truth for the classify router's CONTENT-DERIVED
  * signals (pdf_classify.py:17-44 constants, :91-237 ladder): every count
  * is a regex tally over the raw text layer, generated here for BOTH
  * engines (Spark SQL and DuckDB) from one pattern table, and every
  * threshold comparison is integer-exact (products of counts, never float
  * ratios), so the value compare verifies the measurement itself.
  *
  * Engine differences handled here: Spark SQL string literals process
  * backslash escapes (patterns need doubled backslashes), DuckDB's do not;
  * `size` vs `len` for array length. */
object ClassifySignals {

  /** SUSPICIOUS_CROSS_SCRIPT_RANGES (pdf_classify.py:47-69). */
  val CrossScriptRanges: Vector[(Int, Int, String)] = Vector(
    (0x0400, 0x052F, "cyrillic"), (0x0600, 0x06FF, "arabic"),
    (0x0700, 0x074F, "syriac"), (0x0750, 0x077F, "arabic_sup"),
    (0x0780, 0x07BF, "thaana"), (0x07C0, 0x07FF, "nko"),
    (0x0800, 0x083F, "samaritan"), (0x0840, 0x085F, "mandaic"),
    (0x0860, 0x086F, "syriac_sup"), (0x0870, 0x089F, "arabic_ext_b"),
    (0x0900, 0x097F, "devanagari"), (0x0C80, 0x0CFF, "kannada"),
    (0x1000, 0x109F, "myanmar"), (0x1100, 0x11FF, "hangul_jamo"),
    (0x1200, 0x137F, "ethiopic"), (0x13A0, 0x13FF, "cherokee"),
    (0x1400, 0x167F, "canadian"), (0x1800, 0x18AF, "mongolian"),
    (0x1A20, 0x1AAF, "tai_tham"), (0x2C00, 0x2C5F, "glagolitic"),
    (0xA000, 0xA48F, "yi"))

  /** CJK_TEXT_RANGES (BMP part; the corpus stays in the BMP). */
  val CjkRanges: Vector[(Int, Int)] =
    Vector((0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF))

  /** Latin-language stopword/diacritic profiles for lang_id_v2's latin
    * discriminator (r4) — ONE definition feeding both engines. Marker
    * words are ASCII-only (RE2's `\b` is an ASCII word boundary; a marker
    * with a diacritic would silently never match on the DuckDB side) and
    * pool-unique across the three languages; the diacritic classes are
    * language-unique characters. */
  val LatinMarkers: Vector[(String, String, String)] = Vector(
    ("fr", """\b(le|les|des|est|dans|pour|nous|avec|donc|sans)\b""", "[èêçàâô]"),
    ("de", """\b(der|die|das|und|ist|nicht|mit|von|den|durch)\b""", "[äöüß]"),
    ("es", """\b(el|los|las|para|con|por|pero|como|desde|hasta)\b""", "[ñáíóú]"),
    ("it", """\b(che|della|sono|anche|nella|questo|essere|degli|sulla|quindi)\b""", "[ìò]"),
    ("pt", """\b(uma|com|mais|depois|isso|muito|fazer|anos|seus|pelo)\b""", "[ãõ]"))

  /** Minimum per-doc profile score (marker hits + diacritic hits) before a
    * latin doc leaves 'en'. */
  val LatinScoreMin = 10

  /** The ordered latin decision cascade as SQL text, GENERATED from
    * [[LatinMarkers]] so adding or renaming a language cannot silently
    * leave the decision behind (the column alias per language is the
    * language code itself, on both engines). */
  def latinCascadeSql: String = {
    val langs = LatinMarkers.map(_._1)
    langs.zipWithIndex.map { case (l, i) =>
      val conds = (s"$l >= $LatinScoreMin" +:
        langs.drop(i + 1).map(o => s"$l >= $o")).mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'en' END")
  }

  private def hex(cp: Int): String = f"\\x{$cp%04X}"

  private def rangeClass(ranges: Seq[(Int, Int)]): String =
    ranges.map { case (a, b) => s"${hex(a)}-${hex(b)}" }.mkString("[", "", "]")

  /** Count of regex matches in a column, per engine. `pattern` is the raw
    * regex (single backslashes). */
  private def cnt(spark: Boolean, src: String, pattern: String): String = {
    if (spark) {
      // native count-only expression (functions/TextExprs.CountMatches):
      // same match semantics as size(regexp_extract_all(.., 0)) without
      // materializing an array of every matched substring per page
      val lit = pattern.replace("\\", "\\\\").replace("'", "\\'")
      s"count_matches($src, '$lit')"
    } else {
      val lit = pattern.replace("'", "''")
      s"len(regexp_extract_all($src, '$lit'))"
    }
  }

  /** Total characters covered by matches (for punctuation runs). */
  private def matchChars(spark: Boolean, src: String, pattern: String): String =
    if (spark) {
      val lit = pattern.replace("\\", "\\\\").replace("'", "\\'")
      s"matched_chars($src, '$lit')"
    } else {
      // list_reduce THROWS on an empty list; list_sum returns NULL
      val lit = pattern.replace("'", "''")
      s"coalesce(list_sum(list_transform(regexp_extract_all($src, '$lit'), x -> length(x))), 0)"
    }

  // ASCII punct set "!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~" as contiguous ranges
  private val PunctClass = "[!-/:-@\\[-`{-~]"
  private val U72Whitelist = "犀犁犄犊犒犟犬犯状犷犹狂狄狈狐狗狙狞"

  /** Per-page measured signal columns (SELECT items) over a relation with
    * (doc_id, page_idx, width, height, text, map_err, cid_chars,
    * img_cov_pct). `cleaned` strips whitespace like the reference's
    * re.sub(r"\s+", "") (:333). */
  def pageSelect(spark: Boolean): String = {
    def c(src: String, p: String) = cnt(spark, src, p)
    def mc(src: String, p: String) = matchChars(spark, src, p)
    val cleaned =
      if (spark) "regexp_replace(text, '\\\\s+', '')"
      else "regexp_replace(text, '\\s+', '', 'g')"
    val scripts = CrossScriptRanges.map { case (a, b, name) =>
      s"${c("cleaned", rangeClass(Seq((a, b))))} AS sc_$name"
    }.mkString(",\n  ")
    s"""SELECT doc_id, page_idx,
       |  CASE WHEN width > 10 * height OR height > 10 * width THEN 1 ELSE 0 END AS aspect_bad,
       |  length(text) AS raw_len,
       |  length(cleaned) AS cleaned_len,
       |  ${c("text", "[\\x{FFFD}]")} AS fffd,
       |  ${c("text", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]")} AS ctrl,
       |  ${c("text", "[\\x{E000}-\\x{F8FF}]")} AS pua,
       |  map_err, cid_chars, img_cov_pct,
       |  ${c("cleaned", rangeClass(CjkRanges))} AS cjk,
       |  ${c("cleaned", rangeClass(Seq((0x4E00, 0x9FFF))))} AS han,
       |  ${c("cleaned", s"[\\x{7280}-\\x{72DF}]")} - ${c("cleaned", s"[$U72Whitelist]")} AS u72,
       |  $scripts,
       |  ${c("cleaned", PunctClass)} AS punct,
       |  ${mc("cleaned", PunctClass + "{4,}")} AS punct_run,
       |  ${mc("cleaned", "\\.{8,}")} AS dot_leader
       |FROM (SELECT *, $cleaned AS cleaned FROM __PAGES__)""".stripMargin
  }

  /** Per-doc aggregation + the ordered 8-rule ladder. Input: the per-page
    * relation from [[pageSelect]] restricted to the sampled pages. All
    * comparisons are integer products of counts — exact on both engines.
    * Ladder order = pdf_classify.classify():110-237. */
  def docLadder: String = {
    val scriptSums = CrossScriptRanges.map { case (_, _, n) =>
      s"sum(sc_$n) AS sc_$n"
    }.mkString(", ")
    val dense = CrossScriptRanges.map { case (_, _, n) =>
      s"(CASE WHEN sc_$n >= 5 THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    val susp = CrossScriptRanges.map { case (_, _, n) => s"sc_$n" }.mkString(" + ")
    s"""SELECT doc_id,
       |  CASE
       |    WHEN any_aspect > 0 THEN 1
       |    WHEN cleaned_total < 50 * n_pages THEN 2
       |    WHEN raw_total > 0 AND 100 * map_err_total >= 4 * raw_total THEN 3
       |    WHEN any_cid > 0 THEN 4
       |    WHEN raw_total >= 300 AND 100 * abn_total >= 3 * raw_total THEN 5
       |    WHEN cleaned_total >= 300 AND cjk_total >= 100 AND susp_total >= 120
       |      AND 100 * susp_total >= 18 * cleaned_total AND dense_scripts >= 3 THEN 6
       |    WHEN han_total > 0 AND u72_total >= 30 AND 1000 * u72_total >= 26 * han_total THEN 7
       |    WHEN any_punct > 0 THEN 8
       |    ELSE 0 END AS fired,
       |  img_cov_max
       |FROM (
       |  SELECT agg.*, ($dense) AS dense_scripts, ($susp) AS susp_total FROM (
       |    SELECT doc_id, count(*) AS n_pages,
       |      max(aspect_bad) AS any_aspect,
       |      sum(raw_len) AS raw_total,
       |      sum(cleaned_len) AS cleaned_total,
       |      sum(map_err) AS map_err_total,
       |      sum(fffd) + sum(ctrl) + sum(pua) AS abn_total,
       |      max(CASE WHEN cid_chars >= 30 AND 100 * cid_chars >= raw_len THEN 1 ELSE 0 END) AS any_cid,
       |      sum(cjk) AS cjk_total,
       |      sum(han) AS han_total,
       |      sum(u72) AS u72_total,
       |      $scriptSums,
       |      max(CASE WHEN cleaned_len >= 100
       |        AND 4 * (CASE WHEN cleaned_len - punct >= 80
       |                 THEN greatest(0, punct - dot_leader) ELSE punct END) >= cleaned_len
       |        AND 10 * (CASE WHEN cleaned_len - punct >= 80
       |                  THEN greatest(0, punct_run - dot_leader) ELSE punct_run END) >= cleaned_len
       |        THEN 1 ELSE 0 END) AS any_punct,
       |      max(img_cov_pct) AS img_cov_max
       |    FROM __PAGE_SIGNALS__
       |    GROUP BY doc_id
       |  ) agg
       |) lad""".stripMargin
  }

  /** Sampled-page predicate (get_sample_page_indices, pdf_classify.py:
    * 240-268): up to 10 pages spread evenly; docs of <= 10 pages use all.
    * `.5` rounding boundaries cannot occur (2*i*(pc-1) is even, odd
    * multiples of 9 are odd), so the engines' rounding modes agree. */
  def samplePredicate(spark: Boolean): String =
    if (spark)
      "pc <= 10 OR array_contains(transform(sequence(0, 9), i -> CAST(round(i * (pc - 1) / 9.0) AS INT)), page_idx)"
    else
      "pc <= 10 OR list_contains(list_transform(range(0, 10), i -> round(i * (pc - 1) / 9.0)::INT), page_idx)"
}
