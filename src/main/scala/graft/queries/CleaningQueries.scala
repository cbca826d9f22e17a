package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.clean.Clean
import graft.operators.{Geocode, Multimodal, Relational, Spread}
import graft.queries.ParityQueries.Q

/** Oracle coverage for the cleaning layer, the reference's reconciliation
  * join, J4 drop-unmatched, set operations and multimodal columns.
  *
  * The cleaning queries manufacture the reference's data quirks
  * (sentinel nulls, `.0` float artifacts, embedded-space dates, word-wrap
  * whitespace — FIXTURES.md §1) deterministically from the star schema in
  * BOTH engines, then apply the [[graft.clean.Clean]] operators on the
  * Spark side and equivalent ANSI SQL on the DuckDB side, so the messy →
  * clean semantics (`/root/reference/compare.py:56-69`,
  * `/root/reference/down/down_water_prep.py:460-471`) are hash-checked,
  * not just unit-tested.
  */
object CleaningQueries {

  /** F4/X2/X3/X8/X5 — the cleaning battery: sentinel-null normalization,
    * float-artifact strip + n-prefix keying, whitespace canonicalization,
    * lenient multi-format date parse, and sentinel-date imputation
    * (`compare.py:63`'s `'.'` → 1/9/1999). */
  val q32CleanBattery: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    // Spread before the messy-synthesis + clean battery (all per-row
    // string work; the single-split scan otherwise runs it serial)
    val raw = Spread.byKey(t.orders.select("o_orderkey", "o_custkey",
        "o_orderpriority", "o_orderdate"), "o_orderkey", widthDivisor = 2)
      .select(
      col("o_orderkey"),
      when(col("o_orderkey") % 5 === 0, lit("."))
        .when(col("o_orderkey") % 5 === 1, lit("nan"))
        .when(col("o_orderkey") % 5 === 2, lit("NaN"))
        .when(col("o_orderkey") % 5 === 3, lit(""))
        .otherwise(col("o_orderpriority")).as("raw_val"),
      concat(col("o_custkey").cast("string"),
        when(col("o_orderkey") % 2 === 0, lit(".0")).otherwise(lit(""))).as("raw_key"),
      concat(lit(" "), replace(col("o_orderpriority"), lit("-"), lit("\t  ")), lit(" "))
        .as("raw_ws"),
      when(col("o_orderkey") % 7 === 0,
        replace(date_format(col("o_orderdate"), "MM/dd/yyyy"), lit("/"), lit("/ ")))
        .when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "M/d/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "MM/dd/yyyy")).as("raw_date"))
      .withColumn("raw_date2",
        when(col("o_orderkey") % 11 === 0, lit(".")).otherwise(col("raw_date")))
    raw.select(
      col("o_orderkey"),
      Clean.normalizeNull(col("raw_val")).as("val_clean"),
      Clean.stringKey(col("raw_key"), "n").as("key_n"),
      Clean.normalizeWhitespace(col("raw_ws")).as("ws_clean"),
      Clean.parseDateLenient(col("raw_date")).as("date_clean"),
      coalesce(Clean.parseDateLenient(Clean.normalizeNull(col("raw_date2"))),
        lit("1999-01-09").cast("date")).as("date_imputed"))
      .orderBy("o_orderkey")
  }

  /** J6 — the reference's 7-key reconciliation (`compare.py:88-89`): two
    * independently-messy projections of the same facts are normalized
    * through the Clean layer (trim, `.0` strip, n-prefix, lenient dates,
    * sentinel-date imputation, type-code derivation) and inner-joined on
    * all 7 canonical keys. At scale both sides shuffle once on the key
    * hash — a classic sort-merge join; no broadcast (both sides are
    * fact-sized). */
  val q33Reconcile7Key: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val li = t.lineitem.filter(col("l_quantity") >= 49)
    val keys = Seq("pwsid", "cont", "sysname", "sampdate", "analdate", "samptype", "loc")
    // "down" side: every key arrives messy, exactly like the PDF-parsed CSVs.
    val downRaw = li.select(
      concat(lit(" "), col("l_orderkey").cast("string"), lit(" ")).as("pwsid_raw"),
      concat(col("l_partkey").cast("string"), lit(".0")).as("cont_raw"),
      concat(lit(" "), col("l_returnflag"), col("l_linestatus")).as("sysname_raw"),
      when(col("l_linenumber") % 3 === 0,
        replace(date_format(col("l_shipdate"), "MM/dd/yyyy"), lit("/"), lit("/ ")))
        .otherwise(date_format(col("l_shipdate"), "M/d/yyyy")).as("sampdate_raw"),
      when(col("l_linenumber") % 5 === 0, lit("."))
        .otherwise(date_format(date_add(to_date(col("l_shipdate")), 2), "MM/dd/yyyy"))
        .as("analdate_raw"),
      when(col("l_linenumber") % 2 === 0, lit("ENTRY POINT"))
        .otherwise(lit("DISTRIBUTION")).as("sample_type"),
      col("l_suppkey").cast("string").as("loc_raw"),
      col("l_quantity").as("result_down"))
    val down = downRaw.select(
      trim(col("pwsid_raw")).cast("long").as("pwsid"),
      Clean.stringKey(col("cont_raw")).as("cont"),
      trim(col("sysname_raw")).as("sysname"),
      Clean.parseDateLenient(col("sampdate_raw")).as("sampdate"),
      coalesce(Clean.parseDateLenient(Clean.normalizeNull(col("analdate_raw"))),
        lit("1999-01-09").cast("date")).as("analdate"),
      substring(col("sample_type"), 1, 1).as("samptype"),
      Clean.stringKey(col("loc_raw"), "n").as("loc"),
      col("result_down"))
    // "direct" side: the same facts, already-typed (the emailed workbook).
    val direct = li.select(
      col("l_orderkey").as("pwsid"),
      col("l_partkey").cast("string").as("cont"),
      concat(col("l_returnflag"), col("l_linestatus")).as("sysname"),
      to_date(col("l_shipdate")).as("sampdate"),
      when(col("l_linenumber") % 5 === 0, lit("1999-01-09").cast("date"))
        .otherwise(date_add(to_date(col("l_shipdate")), 2)).as("analdate"),
      when(col("l_linenumber") % 2 === 0, lit("E")).otherwise(lit("D")).as("samptype"),
      concat(lit("n"), col("l_suppkey").cast("string")).as("loc"),
      col("l_extendedprice").as("result_direct"))
    down.join(direct, keys, "inner")
      .select((keys.map(col) :+ col("result_down") :+ col("result_direct")): _*)
      .orderBy((keys.map(col) :+ col("result_down") :+ col("result_direct")): _*)
  }

  /** J4 — strict-then-loose enrichment with drop-unmatched
    * (`direct/direct_water_prep.py:134-166`): ~10% of fact keys are
    * mangled so they miss every level and are dropped, unlike q05 which
    * conserves rows. */
  val q34EnrichDrop: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val data = t.orders.select(
      col("o_orderkey"),
      when(col("o_orderkey") % 10 === 0, col("o_custkey") + 1000000)
        .otherwise(col("o_custkey")).as("custkey"),
      (col("o_orderkey") % 25).cast("int").as("nkey"))
    val dim = t.customer.select(
      col("c_custkey").as("custkey"),
      col("c_nationkey").as("nkey"),
      col("c_name"),
      col("c_acctbal"))
    Relational.hierarchicalEnrich(
      data, dim,
      keyLevels = Seq(Seq("custkey", "nkey"), Seq("custkey")),
      payloadCols = Seq("c_name", "c_acctbal"),
      dimOrder = Seq(col("c_acctbal").desc, col("c_name")),
      dropUnmatched = true,
      hintBroadcast = true)
      .select("o_orderkey", "custkey", "nkey", "c_name", "c_acctbal", "match_level")
      .orderBy("o_orderkey")
  }

  /** U2 — intersect: customers who placed an urgent order AND a finished
    * order (distinct set semantics on both engines). */
  val q35Intersect: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
      .intersect(
        t.orders.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** U2 — except: customers who never placed an urgent order (distinct
    * set except — the native form of the reference's null-split idiom). */
  val q36Except: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.customer.select(col("c_custkey").as("custkey"))
      .except(t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** MM — multimodal asset columns: binary payloads with magic-byte MIME
    * sniffing, byte length, cross-engine sha256 fingerprint, chunk
    * counts, and the nearest-neighbor thumbnail resample
    * ([[Multimodal.resizeStub]], hex-rendered so the oracle replicates
    * the exact byte picks in hex space), all as pure column expressions
    * over `binary`. */
  val q37Multimodal: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val assets = t.documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit(Multimodal.PngMagic), encode(col("text"), "UTF-8")))
        .when(col("doc_id") % 3 === 1,
          concat(lit(Multimodal.JpegMagic), encode(col("text"), "UTF-8")))
        .otherwise(encode(col("text"), "UTF-8")).as("bytes"))
    Multimodal.withMetadata(assets, "bytes").select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.mime").as("mime"),
      col("meta.sha256").as("sha_hex"),
      ceil(col("meta.n_bytes") / 256.0).cast("long").as("n_chunks"),
      hex(Multimodal.resizeStub(col("bytes"), 16)).as("thumb_hex"))
      .orderBy("doc_id")
  }

  /** MM2 — REAL image-container header decode
    * ([[Multimodal.imageHeader]]): the corpus is rendered into
    * structurally VALID PNG / JPEG / GIF payloads (every byte written
    * by hex arithmetic — PNG IHDR big-endian dims + color type, GIF
    * little-endian logical screen, JPEG with an APP0 segment, a
    * VARIABLE-length COM segment derived from the document text, then
    * SOF0 — so the parser's marker walk crosses a text-dependent
    * offset), one doc in ten truncated to 9 bytes (recognized magic,
    * unparseable interior → format with null dims). The oracle states
    * the expected header fields from the construction formulas
    * directly: any mis-walk / endianness / offset error in the parser
    * reads back garbage and mismatches. */
  val q120ImageHeader: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
      lpad(hex(v), nBytes * 2, "0")
    val w = col("doc_id") % 800 + 1
    val h = (col("doc_id") * 7) % 600 + 1
    val colorTypeHex = element_at(
      array(lit("00"), lit("02"), lit("03"), lit("04"), lit("06")),
      (col("doc_id") % 5 + 1).cast("int"))
    val pngHex = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be(w, 4), be(h, 4), lit("08"), colorTypeHex, lit("000000"))
    val comText = expr("substring(text, 1, CAST(doc_id % 30 + 1 AS INT))")
    val comBytes = encode(comText, "UTF-8")
    val nComp = (col("doc_id") % 2 * 2 + 1).cast("int") // 1 or 3
    val compHex = when(nComp === 1, "011100")
      .otherwise("011100" + "021101" + "031101")
    val sofLenHex = when(nComp === 1, "000B").otherwise("0011")
    // every sixth doc carries a minimal APP1 Exif segment (identifier
    // + little-endian TIFF header) between APP0 and COM, so the walk's
    // has_exif detection crosses real segment structure
    val exifSeg = when(col("doc_id") % 6 === 1,
      "FFE1" + "0010" + "457869660000" + "49492A0008000000").otherwise("")
    val jpegHex = concat(
      lit("FFD8" + "FFE0" + "0010" + "4A46494600010100000100010000"),
      exifSeg,
      lit("FFFE"), be(length(comBytes) + 2, 2), hex(comBytes),
      lit("FFC0"), sofLenHex, lit("08"), be(h, 2), be(w, 2),
      be(nComp, 1), compHex)
    val gifHex = concat(lit("474946383961"),
      be(w % 256, 1), be(floor(w / 256).cast("int"), 1),
      be(h % 256, 1), be(floor(h / 256).cast("int"), 1), lit("F70000"))
    val fullBytes = unhex(
      when(col("doc_id") % 3 === 0, pngHex)
        .when(col("doc_id") % 3 === 1, jpegHex)
        .otherwise(gifHex))
    val assets = t.documents.select(col("doc_id"),
      when(col("doc_id") % 10 === 7, fullBytes.substr(1, 9))
        .otherwise(fullBytes).as("bytes"))
    val hdr = Multimodal.imageHeader(col("bytes"))
    assets.select(col("doc_id"),
      hdr.getField("format").as("format"),
      hdr.getField("width").as("width"),
      hdr.getField("height").as("height"),
      hdr.getField("channels").as("channels"),
      // int, not boolean: a NULLABLE boolean hits a None-vs-NaN
      // representation split between the two engines' pandas readers
      // in the driver's comparator; nullable ints take the float path
      // with a both-NaN guard (width/height prove it)
      hdr.getField("has_exif").cast("int").as("exif"),
      Multimodal.sniffMime(col("bytes")).as("mime"))
      .orderBy("doc_id")
  }

  /** MM3 — REAL audio-container header decode
    * ([[Multimodal.audioHeader]]): the corpus rendered into
    * structurally valid WAV (RIFF chunk walk crossing a text-derived
    * odd-length LIST chunk, so even-padding is exercised), FLAC
    * (STREAMINFO bit packing written field by field) and MP3 (ID3v2
    * tag of text-derived syncsafe size skipped to the first frame
    * header) payloads; one doc in ten truncated to 12 bytes
    * (recognized magic, unparseable interior). The oracle states the
    * expected fields from the construction formulas — any endianness
    * / bit-offset / chunk-walk error reads back garbage. */
  val q122AudioHeader: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
      lpad(hex(v), nBytes * 2, "0")
    // little-endian: byte-by-byte from the low end (values here are
    // far under 2^53, so the double division is exact)
    def le(v: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
      concat((0 until nBytes).map(i =>
        be((floor(v.cast("double") / lit(math.pow(256, i))).cast("long")
          % 256).cast("long"), 1)): _*)
    val sr = col("doc_id") % 40000 + 8000
    // --- WAV: fmt + odd-length LIST + data (declared size only)
    val wavCh = (col("doc_id") % 2 + 1).cast("int")
    val wavBits = (col("doc_id") % 2 * 8 + 8).cast("int")
    val blockAlign = wavCh * wavBits / 8
    val nSampWav = col("doc_id") % 1000 + 1
    val listPayload = encode(
      expr("substring(text, 1, CAST(doc_id % 21 + 1 AS INT))"), "UTF-8")
    val wavHex = concat(
      lit("52494646"), le(lit(0L), 4), lit("57415645"),
      lit("666D7420"), le(lit(16L), 4), // "fmt " 16
      le(lit(1L), 2), le(wavCh, 2), le(sr, 4),
      le(sr * blockAlign, 4), le(blockAlign, 2), le(wavBits, 2),
      lit("4C495354"), le(length(listPayload), 4), hex(listPayload),
      when(length(listPayload) % 2 === 1, "00").otherwise(""), // RIFF pad
      lit("64617461"), le(nSampWav * blockAlign, 4)) // data: declared size
    // --- FLAC: STREAMINFO written field by field
    val flacCh = (col("doc_id") % 8 + 1).cast("int")
    val totalFlac = col("doc_id") % 100000 + 1
    val b20 = (sr % 16) * 16 + (flacCh - 1) * 2 // bits-1=15 -> high bit 0
    val b21 = lit(15 % 16 * 16) + (totalFlac / 4294967296L).cast("long") // 0xF0 | total>>32
    val flacHex = concat(
      lit("664C6143"), lit("00"), lit("000022"), // STREAMINFO, len 34
      lit("1000"), lit("1000"), lit("000000"), lit("000000"),
      be((sr / 4096).cast("long"), 1), be((sr / 16 % 256).cast("long"), 1),
      be(b20.cast("long"), 1), be(b21, 1),
      be((totalFlac / 16777216L % 256).cast("long"), 1),
      be((totalFlac / 65536L % 256).cast("long"), 1),
      be((totalFlac / 256L % 256).cast("long"), 1),
      be((totalFlac % 256L).cast("long"), 1),
      lit("00" * 16)) // MD5 placeholder
    // --- MP3: ID3v2 (syncsafe size <= 127) + MPEG1 Layer III frame
    val tagBytes = encode(
      expr("substring(text, 1, CAST(doc_id % 30 + 1 AS INT))"), "UTF-8")
    val srIdx = expr("(doc_id div 3) % 3")
    val mp3Hex = concat(
      lit("494433" + "0400" + "00" + "000000"), be(length(tagBytes), 1),
      hex(tagBytes),
      lit("FFFB"), be(lit(0x90L) + srIdx * 4, 1),
      when(col("doc_id") % 2 === 0, "C0").otherwise("00"))
    val fullBytes = unhex(
      when(col("doc_id") % 3 === 0, wavHex)
        .when(col("doc_id") % 3 === 1, flacHex)
        .otherwise(mp3Hex))
    val assets = t.documents.select(col("doc_id"),
      when(col("doc_id") % 10 === 7, fullBytes.substr(1, 12))
        .otherwise(fullBytes).as("bytes"))
    val hdr = Multimodal.audioHeader(col("bytes"))
    assets.select(col("doc_id"),
      hdr.getField("format").as("format"),
      hdr.getField("sample_rate").as("sample_rate"),
      hdr.getField("channels").as("channels"),
      hdr.getField("bits_per_sample").as("bits_per_sample"),
      hdr.getField("n_samples").as("n_samples"),
      Multimodal.sniffMime(col("bytes")).as("mime"))
      .orderBy("doc_id")
  }


  /** MM4 — REAL video-container header decode
    * ([[Multimodal.videoHeader]]): the corpus rendered into
    * structurally valid MP4s — ftyp (brand rotated), a text-derived
    * free box (so the top-level walk crosses a variable offset), and
    * a full moov with spec-length mvhd (BOTH versions: v0 u32 fields,
    * v1 u64 — alternating per doc) and trak/tkhd (16.16 fixed-point
    * dimensions at the box tail). One doc in ten truncated to the
    * bare ftyp (format + brand survive, fields null). The oracle
    * states expected fields from the construction formulas. */
  val q123VideoHeader: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
      lpad(hex(v), nBytes * 2, "0")
    def beL(v: Long, nBytes: Int): String =
      ("%0" + (nBytes * 2) + "X").format(v)
    def ascii(sx: String): String =
      sx.getBytes("ISO-8859-1").map("%02X".format(_)).mkString
    val timescale = col("doc_id") % 9000 + 1000
    val durationU = col("doc_id") % 100000 + 1
    val w = col("doc_id") % 1920 + 1
    val h = (col("doc_id") * 3) % 1080 + 1
    val brandHex = element_at(
      array(lit(ascii("isom")), lit(ascii("mp42")), lit(ascii("avc1"))),
      (col("doc_id") % 3 + 1).cast("int"))
    val ftypHex = concat(lit(beL(16, 4) + ascii("ftyp")), brandHex,
      lit("00000000"))
    val freePayload = encode(
      expr("substring(text, 1, CAST(doc_id % 17 + 1 AS INT))"), "UTF-8")
    val freeHex = concat(be(length(freePayload) + 8, 4), lit(ascii("free")),
      hex(freePayload))
    // mvhd v0: 100-byte payload; v1: 112-byte (u64 times + duration)
    val mvhdV0 = concat(lit(beL(108, 4) + ascii("mvhd") + "00000000" +
        "00000000" + "00000000"),
      be(timescale, 4), be(durationU, 4), lit("00" * 80))
    val mvhdV1 = concat(lit(beL(120, 4) + ascii("mvhd") + "01000000" +
        "0000000000000000" + "0000000000000000"),
      be(timescale, 4), be(durationU, 8), lit("00" * 80))
    val mvhdHex = when(col("doc_id") % 2 === 0, mvhdV0).otherwise(mvhdV1)
    val mvhdSize = when(col("doc_id") % 2 === 0, 108L).otherwise(120L)
    // tkhd v0: 84-byte payload, width/height 16.16 in the last 8 bytes
    val tkhdHex = concat(lit(beL(92, 4) + ascii("tkhd")), lit("00" * 76),
      be(w, 2), lit("0000"), be(h, 2), lit("0000"))
    val trakHex = concat(lit(beL(100, 4) + ascii("trak")), tkhdHex)
    // moov size = 8 (header) + mvhd box + trak box (100)
    val moovHex = concat(be(mvhdSize + 108, 4), lit(ascii("moov")),
      mvhdHex, trakHex)
    val fullBytes = unhex(concat(ftypHex, freeHex, moovHex))
    val assets = t.documents.select(col("doc_id"),
      when(col("doc_id") % 10 === 7, fullBytes.substr(1, 16))
        .otherwise(fullBytes).as("bytes"))
    val hdr = Multimodal.videoHeader(col("bytes"))
    assets.select(col("doc_id"),
      hdr.getField("format").as("format"),
      hdr.getField("brand").as("brand"),
      hdr.getField("timescale").as("timescale"),
      hdr.getField("duration_units").as("duration_units"),
      hdr.getField("width").as("width"),
      hdr.getField("height").as("height"),
      Multimodal.sniffMime(col("bytes")).as("mime"))
      .orderBy("doc_id")
  }


  /** MM5 — REAL WAV-PCM FEATURE DECODE ([[Multimodal.wavPcmFeatures]]):
    * the corpus rendered into structurally valid 16-bit mono PCM WAVs
    * whose sample values follow a doc_id formula, decoded to 4 exact
    * integer bucket sums (the amplitude envelope) — the oracle replays
    * the formula arithmetically, so any endianness / sign-extension /
    * bucketing error in the sample decode reads back wrong values. One
    * doc in ten truncated after the data-size declaration (payload
    * missing → features null: this is a DECODER, not a header read). */
  val q150WavFeatures: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
      lpad(hex(v), nBytes * 2, "0")
    def le(v: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
      concat((0 until nBytes).map(i =>
        be(shiftright(v.cast("long"), 8 * i).bitwiseAND(lit(255L)), 1)): _*)
    val nFr = col("doc_id") % 32 + 8
    // sample j (unsigned 16-bit): u(j) = (doc_id·131 + j·17) mod 65536,
    // stored little-endian; the decoder must read it back as SIGNED
    val dataHex = array_join(
      transform(sequence(lit(0), (nFr - 1).cast("int")), j => {
        val u = (col("doc_id") * 131 + j * 17) % 65536
        concat(be(u.bitwiseAND(lit(255L)), 1),
          be(shiftright(u, 8), 1))
      }), "")
    val wavHex = concat(
      lit("52494646"), le(lit(0L), 4), lit("57415645"),
      lit("666D7420"), le(lit(16L), 4),
      le(lit(1L), 2), le(lit(1L), 2), le(lit(8000L), 4),
      le(lit(16000L), 4), le(lit(2L), 2), le(lit(16L), 2),
      lit("64617461"), le(nFr * 2, 4),
      dataHex)
    val fullBytes = unhex(wavHex)
    // NOT Spread-widened: the WAV synthesis+decode measured ~0.3 CPU
    // core-s total — the exchange costs more than the width saves
    val assets = t.documents.select(col("doc_id"),
      // header + declared data size survive; the payload does not
      when(col("doc_id") % 10 === 7, fullBytes.substr(1, 44))
        .otherwise(fullBytes).as("bytes"))
    val f = Multimodal.wavPcmFeatures(col("bytes"), 4)
    // alias-first so the decode runs once per row, not per element_at
    // (CollapseProject keeps the boundary — the q171 rationale)
    assets.select(col("doc_id"), f.as("__f"))
      .select(col("doc_id"),
        element_at(col("__f"), 1).as("f0"), element_at(col("__f"), 2).as("f1"),
        element_at(col("__f"), 3).as("f2"), element_at(col("__f"), 4).as("f3"))
      .orderBy("doc_id")
  }

  /** Shared BMP synthesis for q151/q152: structurally valid 24-bit
    * bottom-up BMPs (padded rows) whose pixel channels follow doc_id
    * formulas, one doc in ten truncated after the headers (pixel
    * payload missing → decode null). */
  private def bmpAssets(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lpad(hex(v), 2, "0")
    def le(v: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
      concat((0 until nBytes).map(i =>
        be(shiftright(v.cast("long"), 8 * i).bitwiseAND(lit(255L)))): _*)
    val w = (col("doc_id") % 12 + 4).cast("int")
    val h = ((col("doc_id") * 3) % 10 + 4).cast("int")
    val stride = (((w * 3 + 3) / lit(4)).cast("int") * 4)
    val padHex = lit("000000").substr(lit(1), (stride - w * 3) * 2)
    def pxHex(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      concat( // BGR on disk
        be((col("doc_id") * 5 + x * 2 + y * 3) % 256),
        be((col("doc_id") * 3 + x * 5 + y * 11) % 256),
        be((col("doc_id") + x * 7 + y * 13) % 256))
    // bottom-up: file row i carries image row y = h−1−i
    val pixelsHex = array_join(
      transform(sequence(lit(0), h - 1), i => concat(
        array_join(transform(sequence(lit(0), w - 1),
          x => pxHex(x, h - 1 - i)), ""),
        padHex)), "")
    val bmpHex = concat(
      lit("424D"), le(lit(54) + h * stride, 4), lit("00000000"), le(lit(54), 4),
      le(lit(40), 4), le(w, 4), le(h, 4), le(lit(1), 2), le(lit(24), 2),
      le(lit(0), 4), le(h * stride, 4),
      le(lit(0), 4), le(lit(0), 4), le(lit(0), 4), le(lit(0), 4),
      pixelsHex)
    val fullBytes = unhex(bmpHex)
    // widen before synthesis: ids cross the exchange, bytes don't (Spread)
    Spread.byKey(t.documents.select("doc_id"), "doc_id").select(col("doc_id"),
      when(col("doc_id") % 10 === 7, fullBytes.substr(1, 58))
        .otherwise(fullBytes).as("bytes"))
  }

  /** MM6 — REAL BMP PIXEL DECODE ([[Multimodal.bmpGridFeatures]]):
    * per-cell (r, g, b) channel sums over a 2×2 grid of the actual
    * pixels, long-exploded to (doc_id, idx, v) rows — the oracle
    * replays the pixel formula + forward-map bucketing arithmetically,
    * so any BGR-order / bottom-up / row-padding / bucketing error in
    * the decoder reads back wrong sums. Truncated docs decode null →
    * zero rows (mirrored by the oracle's doc filter). */
  val q151BmpFeatures: Q = (spark, dir) =>
    bmpAssets(spark, dir).select(col("doc_id"),
        posexplode(Multimodal.bmpGridFeatures(col("bytes"), 2, 2))
          .as(Seq("idx", "v")))
      .orderBy("doc_id", "idx")

  /** MM7 — REAL RESIZE ∘ DECODE ([[Multimodal.bmpResizeNearest]] →
    * [[Multimodal.bmpGridFeatures]]): every asset nearest-neighbor
    * resized to 5×4 (an actual emitted BMP — the thumbnail step), then
    * whole-image channel sums of the RESIZED pixels. The oracle
    * replays the ⌊x₂·w/5⌋/⌊y₂·h/4⌋ source-pixel selection and the
    * channel formulas — an end-to-end arithmetic check that the
    * resize emits exactly the right pixels in a decodable container. */
  val q152BmpResize: Q = (spark, dir) =>
    bmpAssets(spark, dir).select(col("doc_id"),
        posexplode(Multimodal.bmpGridFeatures(
          Multimodal.bmpResizeNearest(col("bytes"), 5, 4), 1, 1))
          .as(Seq("idx", "v")))
      .orderBy("doc_id", "idx")

  /** MM9 — REAL PNG DECODE, validated through the engine's own ENCODER
    * ([[Multimodal.pngEncodeRgb]] → [[Multimodal.pngGridFeatures]]):
    * per-doc raw RGB pixels follow doc_id formulas (built with the same
    * hex machinery as the BMP corpus), are deflate-compressed into a
    * standard PNG, then decoded back to 2×2 grid channel sums. The
    * oracle replays the pixel formulas arithmetically — DuckDB never
    * parses a PNG, yet any error in the encoder's layout, the chunk
    * walk, the Inflater plumbing, the unfilters or the bucketing reads
    * back wrong sums. One doc in ten is truncated mid-IDAT (decode
    * null → zero rows, mirrored by the oracle's filter). */
  val q163PngFeatures: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lpad(hex(v), 2, "0")
    val w = (col("doc_id") % 9 + 3).cast("int")
    val h = ((col("doc_id") * 5) % 7 + 3).cast("int")
    def pxHex(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      concat(
        be((col("doc_id") * 7 + x * 3 + y * 5) % 256),
        be((col("doc_id") * 11 + x + y * 2) % 256),
        be((col("doc_id") * 13 + x * 9 + y) % 256))
    val rawHex = array_join(
      transform(sequence(lit(0), h - 1), y => array_join(
        transform(sequence(lit(0), w - 1), x => pxHex(x, y)), "")), "")
    val png = Multimodal.pngEncodeRgb(unhex(rawHex), w, h)
    val bytes = when(col("doc_id") % 10 === 7, png.substr(1, 40)).otherwise(png)
    Spread.byKey(t.documents.select("doc_id"), "doc_id").select(col("doc_id"),
        posexplode(Multimodal.pngGridFeatures(bytes, 2, 2)).as(Seq("idx", "v")))
      .orderBy("doc_id", "idx")
  }

  /** MM10 — PALETTE PNG DECODE, validated through the engine's own
    * palette encoder ([[Multimodal.pngEncodePalette]] →
    * [[Multimodal.pngGridFeatures]]): per-doc index pixels and a
    * 4–8-entry RGB table follow doc_id formulas, encode to a standard
    * color-type-3 PNG (PLTE chunk, filter-0 rows, CRCs), decode back
    * through the PLTE indirection to 2×2 grid sums. The oracle replays
    * `palette[idx(x, y)]` arithmetically — DuckDB never parses a PNG,
    * yet any error in the PLTE capture, the 1-byte-per-pixel unfilter
    * path or the indirection reads back wrong sums. One doc in ten is
    * truncated mid-file (decode null → zero rows, mirrored by the
    * oracle's filter). */
  val q169PngPalette: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lpad(hex(v), 2, "0")
    val w = (col("doc_id") % 9 + 3).cast("int")
    val h = ((col("doc_id") * 5) % 7 + 3).cast("int")
    val n = (col("doc_id") % 5 + 4).cast("int") // 4–8 palette entries
    val palHex = array_join(transform(sequence(lit(0), n - 1), i => concat(
      be((col("doc_id") * 7 + i * 29) % 256),
      be((col("doc_id") * 3 + i * 53) % 256),
      be((col("doc_id") * 11 + i * 17) % 256))), "")
    val idxHex = array_join(
      transform(sequence(lit(0), h - 1), y => array_join(
        transform(sequence(lit(0), w - 1),
          x => be((col("doc_id") + x * 3 + y * 5) % n)), "")), "")
    val png = Multimodal.pngEncodePalette(unhex(idxHex), w, h, unhex(palHex))
    val bytes = when(col("doc_id") % 10 === 7, png.substr(1, 40)).otherwise(png)
    // NOT Spread-widened: the palette decode is small (marginal wall
    // gain measured against a multi-core-second per-task CPU floor)
    t.documents.select(col("doc_id"),
        posexplode(Multimodal.pngGridFeatures(bytes, 2, 2)).as(Seq("idx", "v")))
      .orderBy("doc_id", "idx")
  }

  /** MM11 — GIF LZW DECODE, validated through the engine's own GIF
    * encoder ([[Multimodal.gifEncodePalette]] →
    * [[Multimodal.gifGridFeatures]]): the q169 fixture scheme in the
    * LZW container — per-doc index pixels and a 4–8-entry table encode
    * to a standard GIF89a (global color table, literal LZW with
    * clear-code discipline), decode back through the variable-width
    * LZW decoder + table indirection to 2×2 grid sums. Different pixel
    * formulas than q169 so a copy-paste confusion between the two
    * decoders cannot pass both. One doc in ten truncated (null → zero
    * rows). */
  val q170GifLzw: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lpad(hex(v), 2, "0")
    val w = (col("doc_id") % 8 + 4).cast("int")
    val h = ((col("doc_id") * 3) % 6 + 3).cast("int")
    val n = (col("doc_id") % 5 + 4).cast("int") // 4–8 table entries
    val palHex = array_join(transform(sequence(lit(0), n - 1), i => concat(
      be((col("doc_id") * 5 + i * 37) % 256),
      be((col("doc_id") * 9 + i * 41) % 256),
      be((col("doc_id") * 2 + i * 59) % 256))), "")
    val idxHex = array_join(
      transform(sequence(lit(0), h - 1), y => array_join(
        transform(sequence(lit(0), w - 1),
          x => be((col("doc_id") * 2 + x * 5 + y * 7) % n)), "")), "")
    val gif = Multimodal.gifEncodePalette(unhex(idxHex), w, h, unhex(palHex))
    val bytes = when(col("doc_id") % 10 === 7, gif.substr(1, 20)).otherwise(gif)
    // NOT Spread-widened: same rationale as the palette PNG (q169)
    t.documents.select(col("doc_id"),
        posexplode(Multimodal.gifGridFeatures(bytes, 2, 2)).as(Seq("idx", "v")))
      .orderBy("doc_id", "idx")
  }

  /** MM12 — FLAC SAMPLE DECODE, validated through the engine's own
    * FLAC encoder ([[Multimodal.flacEncodePcm]] →
    * [[Multimodal.flacPcmFeatures]]): per-doc 16-bit PCM (1 or 2
    * channels, 20–619 samples → one to three 256-sample frames) whose
    * samples follow doc_id formulas, compressed to a real FLAC stream
    * (STREAMINFO + MD5, rice-coded fixed-order-2 predictors, CONSTANT
    * subframes for the one-in-seven flat docs, VERBATIM short tails,
    * CRC-8/16), decoded back to the q150 amplitude envelope. The
    * oracle replays the sample arithmetic — DuckDB never parses FLAC,
    * yet any error in the rice coding, the predictor reconstruction,
    * the frame segmentation or the MD5/CRC plumbing reads back wrong
    * sums. One doc in ten truncated mid-STREAMINFO (decode null →
    * null features, mirrored by the oracle's CASE). */
  val q171FlacFeatures: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def be(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lpad(hex(v), 2, "0")
    val nFr = col("doc_id") % 600 + 20
    val ch = (col("doc_id") % 2 + 1).cast("int")
    // flat docs (mult = 0) exercise CONSTANT subframes end to end
    val mult = when(col("doc_id") % 7 === 3, lit(0L)).otherwise(lit(1L))
    val nTot = (nFr * ch).cast("int")
    // interleaved sample t (unsigned 16-bit): u(t) = (doc_id·97 +
    // t·31·mult) mod 65536, stored LE; the decoder reads it back SIGNED
    val dataHex = array_join(
      transform(sequence(lit(0), nTot - 1), tt => {
        val u = (col("doc_id") * 97 + tt * 31 * mult) % 65536
        concat(be(u.bitwiseAND(lit(255L))), be(shiftright(u, 8)))
      }), "")
    val flac = Multimodal.flacEncodePcm(unhex(dataHex), ch, lit(8000))
    val bytes = when(col("doc_id") % 10 === 7, flac.substr(1, 30)).otherwise(flac)
    val f = Multimodal.flacPcmFeatures(bytes, 4)
    // two-step projection ON PURPOSE: aliasing the feature array first
    // makes CollapseProject keep the boundary (non-cheap expression
    // referenced 4×), so the encode→decode chain runs ONCE per row
    // instead of once per element_at (r18; measured 4× the decode CPU)
    Spread.byKey(t.documents.select("doc_id"), "doc_id")
      .select(col("doc_id"), f.as("__f"))
      .select(col("doc_id"),
        element_at(col("__f"), 1).as("f0"), element_at(col("__f"), 2).as("f1"),
        element_at(col("__f"), 3).as("f2"), element_at(col("__f"), 4).as("f3"))
      .orderBy("doc_id")
  }

  /** TX — MOJIBAKE REPAIR under the oracle gate: the corpus extended
    * with a multilingual marker (accents, CJK, cp1252 punctuation, an
    * astral-plane check via …), then one doc in three garbled as a
    * Latin-1 read of the UTF-8 bytes, one in three as a Windows-1252
    * read (simulated with `translate` over the 27 defined 0x80–0x9F
    * codepoints — byte-exactly what a cp1252 decoder produces), the
    * rest left clean. [[graft.clean.Clean.fixMojibake]] must invert
    * both corruptions exactly AND pass the clean third through
    * untouched — the oracle is simply the UNCORRUPTED text, so any
    * over- or under-repair hash-fails. */
  val q172FixMojibake: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val marker = " Émile café 数据库 – €1,50 ™ …done #"
    val derived = concat(col("text"), lit(marker), col("doc_id").cast("string"))
    val latin1 = decode(encode(derived, "UTF-8"), "ISO-8859-1")
    // the cp1252 read differs from the Latin-1 read exactly on the 27
    // defined 0x80–0x9F bytes (the 5 undefined ones pass through as C1)
    val c1 = "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A" +
      "\u008B\u008C\u008E\u0091\u0092\u0093\u0094\u0095\u0096\u0097" +
      "\u0098\u0099\u009A\u009B\u009C\u009E\u009F"
    val cp = "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030\u0160" +
      "\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022\u2013\u2014" +
      "\u02DC\u2122\u0161\u203A\u0153\u017E\u0178"
    val garbled = when(col("doc_id") % 3 === 0, latin1)
      .when(col("doc_id") % 3 === 1, translate(latin1, c1, cp))
      .otherwise(derived)
    t.documents.select(col("doc_id"),
      graft.clean.Clean.fixMojibake(garbled).as("repaired"))
      .orderBy("doc_id")
  }

  /** MM8 — chunking + frame sampling get the ORACLE the spec-only
    * coverage lacked ([[Multimodal.chunkBytes]] → every-2nd-chunk
    * [[Multimodal.frameSample]]): the corpus text as UTF-8 payloads cut
    * into 32-byte chunks, sampled at stride 2, each surviving chunk
    * reported with its byte length and 4-byte head — DuckDB replays
    * the chunk arithmetic with blob substring, so off-by-one in the
    * 1-based substr math or the ceil chunk count hash-fails. */
  val q154ChunkSample: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val assets = t.documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("bytes"))
    val chunks = Multimodal.chunkBytes(assets, "doc_id", "bytes", chunkSize = 32)
    Multimodal.frameSample(chunks, stride = 2)
      .select(col("doc_id"), col("chunk_id"),
        length(col("chunk")).cast("long").as("n_bytes"),
        hex(col("chunk").substr(1, 4)).as("head_hex"))
      .orderBy("doc_id", "chunk_id")
  }

  /** DQ quantile profile — EXACT distributed selection
    * ([[graft.operators.Quality.quantileProfile]]): the value at
    * sorted index (n−1)·p div 1000 for eight permille points over
    * lineitem's price column, found by range partition + per-partition
    * rank + bounded offsets (never a global sort funnel). The oracle
    * replays the identical lower-nearest definition with a true global
    * row_number. */
  val q126Quantiles: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    graft.operators.Quality.quantileProfile(t.lineitem, "l_extendedprice")
  }


  /** DQ grouped quantiles — [[graft.operators.Quality.groupedQuantiles]]:
    * per-language document-length percentiles in one window pass (the
    * corpus-report table), same lower-nearest integer definition as
    * q126, replayed per group by the oracle. */
  val q128GroupedQuantiles: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    graft.operators.Quality.groupedQuantiles(t.documents, Seq("lang"), "n_chars")
      .orderBy("lang", "permille", "rank", "value")
  }

  /** DQ robust-fence outliers — [[graft.operators.Quality.iqrOutlierReport]]:
    * per-event-type Tukey-fence counts over exact grouped quartiles (the
    * doubled-inequality form, so both engines run the identical IEEE
    * sequence on the double `value` column — no 1.5 literal, no divide). */
  val q137IqrOutliers: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    graft.operators.Quality.iqrOutlierReport(t.events, Seq("event_type"), "value")
      .orderBy("event_type")
  }

  /** Entity resolution — [[graft.operators.FuzzyMatch.fuzzyPairs]]:
    * part-name pairs within Levenshtein 3, candidates from disjoint
    * 3-segment blocking (80 pairs from 274 candidates over 64 names at
    * sf0.01 — never the all-pairs cross). The oracle rebuilds the same
    * segments with the same integer boundary arithmetic and DuckDB's
    * own levenshtein. */
  val q139FuzzyMatch: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val names = t.part.groupBy("p_name").agg(min("p_partkey").as("name_id"))
    graft.operators.FuzzyMatch.fuzzyPairs(names, "name_id", "p_name", maxDist = 3)
      .orderBy("a_id", "b_id")
  }

  /** DQ profile — per-column row/null/distinct counts and min/max from
    * one scan ([[graft.operators.Quality.profile]]), over the orders
    * table's key and status columns. */
  val q58Profile: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    // deliberately NOT Spread-widened: the profile's per-partition
    // sort-aggregate overhead grows ~linearly with width (SpreadStudy4:
    // serial 1.5 CPU / 1.9 s wall vs 7.4 CPU / 1.5 s at 32) — the wall
    // gain never pays for the CPU at any width on this shape
    graft.operators.Quality.profile(t.orders,
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy("column")
  }

  /** Order-independent table checksum over lineitem's portable-rendering
    * columns — the pipeline regression gate / migration check, verified
    * value-exact against DuckDB's reproduction of the same hash sum. */
  val q61Checksum: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
    // project to the checksummed columns, then widen the narrow scan so
    // the per-row hash runs at machine width (Spread)
    graft.operators.Quality.tableChecksum(
      Spread.byKey(t.lineitem.select(cols.map(col): _*), "l_orderkey"), cols)
  }

  /** Geocoding enrichment ([[graft.operators.Geocode]]) — the reference's
    * manual Google-Sheets detour (`down_water_prep.py:405-423`) as an
    * operator. Customer rows get synthetic messy address parts (padding,
    * case drift, conditional ADDRESS2); the lookup is the clean-spelled
    * address → deterministic coordinates for 2/3 of the address space;
    * 1/7 of rows carry their own coordinates which must win. Exercises
    * the conditional key assembly, canonical-form matching, broadcast
    * lookup join, both-or-neither pair selection and the 3-way lineage
    * tag. */
  val q64Geocode: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val base = t.customer.join(broadcast(t.nation),
      col("c_nationkey") === col("n_nationkey"))
    val sites = base.select(
      col("c_custkey"),
      concat(lit("  "), (col("c_custkey") % 100).cast("string"), lit("  MAIN st"))
        .as("addr1"),
      when(col("c_custkey") % 4 === 0,
        concat(lit("APT "), (col("c_custkey") % 10).cast("string"))).as("addr2"),
      col("n_name").as("city"),
      concat(lit("S"), col("n_regionkey").cast("string")).as("state"),
      (lit(10000) + col("c_custkey") % 500).cast("string").as("zip"),
      when(col("c_custkey") % 7 === 0, lit(40.5)).as("latitude"),
      when(col("c_custkey") % 7 === 0, lit(-75.25)).as("longitude"))
      .withColumn("lat_long_address", Geocode.addressKey(
        col("addr1"), col("addr2"), col("city"), col("state"), col("zip")))
    // curated lookup: clean spelling of the same address space, coords a
    // pure function of address components (zip → lat, street no. → lon)
    // so the distinct lookup stays unique per address on both engines
    val lookup = base.filter(col("c_custkey") % 3 =!= 2).select(
      Geocode.addressKey(
        concat((col("c_custkey") % 100).cast("string"), lit(" MAIN ST")),
        when(col("c_custkey") % 4 === 0,
          concat(lit("APT "), (col("c_custkey") % 10).cast("string"))),
        col("n_name"),
        concat(lit("S"), col("n_regionkey").cast("string")),
        (lit(10000) + col("c_custkey") % 500).cast("string")).as("address"),
      ((col("c_custkey") % 500) % 120 - 60 + 0.5).as("latitude"),
      ((col("c_custkey") % 100) * 3 - 150 + 0.25).as("longitude"))
      .distinct()
    Geocode.enrich(sites, lookup, addressCol = "lat_long_address")
      .select("c_custkey", "lat_long_address", "latitude", "longitude", "geo_source")
      .orderBy("c_custkey")
  }

  /** DQ6 — the row-share skew report ([[graft.operators.Quality
    * .skewReport]]): top key tuples by row count with exact integer
    * permille shares — the gate for the hot key AQE's byte-based skew
    * split cannot see once the partition compresses (SkewStudy,
    * SCALING.md r13). Two keys exercise the tuple form; the oracle
    * recomputes counts, the integral share division, and the
    * (n_rows desc, keys asc) top-N cut. */
  val q107SkewReport: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    graft.operators.Quality.skewReport(t.lineitem,
        Seq("l_returnflag", "l_linestatus"), topN = 4)
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** DQ7 — distribution drift between two corpus snapshots
    * ([[graft.operators.Quality.distributionDrift]]): the view-events
    * value distribution as the reference, click events as the current
    * snapshot, 20 equal-width bins under the REFERENCE bounds, exact
    * integral permille shares and the per-bin L1 drift — the
    * dataset-shift gate a training pipeline runs batch-over-batch,
    * in pure integer/IEEE arithmetic the oracle replays bit-for-bit
    * (no PSI: its transcendental ln is not cross-engine-exact). */
  val q113Drift: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    graft.operators.Quality.distributionDrift(
      t.events.filter(col("event_type") === "view"),
      t.events.filter(col("event_type") === "click"),
      "value", nBins = 20)
      .withColumn("bin", col("bin").cast("long"))
  }

  val all: Map[String, Q] = Map(
    "q58_profile" -> q58Profile,
    "q61_checksum" -> q61Checksum,
    "q107_skew_report" -> q107SkewReport,
    "q113_drift" -> q113Drift,
    "q32_clean_battery" -> q32CleanBattery,
    "q33_reconcile_7key" -> q33Reconcile7Key,
    "q34_enrich_drop" -> q34EnrichDrop,
    "q35_intersect" -> q35Intersect,
    "q36_except" -> q36Except,
    "q37_multimodal" -> q37Multimodal,
    "q120_image_header" -> q120ImageHeader,
    "q122_audio_header" -> q122AudioHeader,
    "q123_video_header" -> q123VideoHeader,
    "q150_wav_features" -> q150WavFeatures,
    "q151_bmp_features" -> q151BmpFeatures,
    "q152_bmp_resize" -> q152BmpResize,
    "q154_chunk_sample" -> q154ChunkSample,
    "q163_png_features" -> q163PngFeatures,
    "q169_png_palette" -> q169PngPalette,
    "q170_gif_lzw" -> q170GifLzw,
    "q171_flac_features" -> q171FlacFeatures,
    "q172_fix_mojibake" -> q172FixMojibake,
    "q126_quantiles" -> q126Quantiles,
    "q128_grouped_quantiles" -> q128GroupedQuantiles,
    "q137_iqr_outliers" -> q137IqrOutliers,
    "q139_fuzzy_match" -> q139FuzzyMatch,
    "q64_geocode" -> q64Geocode)

  // ------------------------------------------------------------- oracle SQL

  // NB: no line in this CTE may START with "||" — the enclosing oracle
  // string runs stripMargin over the interpolated result, which would eat
  // the first bar of a leading "||".
  private val rawsCte =
    """raw AS (SELECT o_orderkey,
      |  CASE o_orderkey % 5 WHEN 0 THEN '.' WHEN 1 THEN 'nan' WHEN 2 THEN 'NaN'
      |    WHEN 3 THEN '' ELSE o_orderpriority END AS raw_val,
      |  CAST(o_custkey AS VARCHAR) ||
      |    CASE WHEN o_orderkey % 2 = 0 THEN '.0' ELSE '' END AS raw_key,
      |  ' ' || regexp_replace(o_orderpriority, '-', chr(9) || '  ', 'g') || ' ' AS raw_ws,
      |  CASE WHEN o_orderkey % 7 = 0
      |         THEN replace(strftime(o_orderdate, '%m/%d/%Y'), '/', '/ ')
      |       WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%-m/%-d/%Y')
      |       ELSE strftime(o_orderdate, '%m/%d/%Y') END AS raw_date
      |FROM orders),
      |raw2 AS (SELECT *, CASE WHEN o_orderkey % 11 = 0 THEN '.' ELSE raw_date END AS raw_date2
      |FROM raw)""".stripMargin

  private val downSideSql =
    """down_raw AS (
      |  SELECT ' ' || CAST(l_orderkey AS VARCHAR) || ' ' AS pwsid_raw,
      |    CAST(l_partkey AS VARCHAR) || '.0' AS cont_raw,
      |    ' ' || l_returnflag || l_linestatus AS sysname_raw,
      |    CASE WHEN l_linenumber % 3 = 0
      |           THEN replace(strftime(l_shipdate, '%m/%d/%Y'), '/', '/ ')
      |         ELSE strftime(l_shipdate, '%-m/%-d/%Y') END AS sampdate_raw,
      |    CASE WHEN l_linenumber % 5 = 0 THEN '.'
      |         ELSE strftime(l_shipdate + INTERVAL 2 DAY, '%m/%d/%Y') END AS analdate_raw,
      |    CASE WHEN l_linenumber % 2 = 0 THEN 'ENTRY POINT' ELSE 'DISTRIBUTION' END AS sample_type,
      |    CAST(l_suppkey AS VARCHAR) AS loc_raw,
      |    l_quantity AS result_down
      |  FROM lineitem WHERE l_quantity >= 49),
      |down AS (
      |  SELECT CAST(trim(pwsid_raw) AS BIGINT) AS pwsid,
      |    regexp_replace(trim(cont_raw), '\.0$', '') AS cont,
      |    trim(sysname_raw) AS sysname,
      |    CAST(try_strptime(replace(trim(sampdate_raw), ' ', ''), '%m/%d/%Y') AS DATE) AS sampdate,
      |    COALESCE(CAST(try_strptime(replace(trim(
      |        CASE WHEN analdate_raw IN ('.', '', 'nan', 'NaN') THEN NULL ELSE analdate_raw END
      |      ), ' ', ''), '%m/%d/%Y') AS DATE), DATE '1999-01-09') AS analdate,
      |    substring(sample_type, 1, 1) AS samptype,
      |    'n' || regexp_replace(trim(loc_raw), '\.0$', '') AS loc,
      |    result_down
      |  FROM down_raw),
      |direct AS (
      |  SELECT l_orderkey AS pwsid,
      |    CAST(l_partkey AS VARCHAR) AS cont,
      |    l_returnflag || l_linestatus AS sysname,
      |    CAST(l_shipdate AS DATE) AS sampdate,
      |    CASE WHEN l_linenumber % 5 = 0 THEN DATE '1999-01-09'
      |         ELSE CAST(l_shipdate + INTERVAL 2 DAY AS DATE) END AS analdate,
      |    CASE WHEN l_linenumber % 2 = 0 THEN 'E' ELSE 'D' END AS samptype,
      |    'n' || CAST(l_suppkey AS VARCHAR) AS loc,
      |    l_extendedprice AS result_direct
      |  FROM lineitem WHERE l_quantity >= 49)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q64_geocode" ->
      """WITH base AS (
        |  SELECT c_custkey, n_name, n_regionkey
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |sites AS (
        |  SELECT c_custkey,
        |    '  ' || CAST(c_custkey % 100 AS VARCHAR) || '  MAIN st' AS addr1,
        |    CASE WHEN c_custkey % 4 = 0
        |         THEN 'APT ' || CAST(c_custkey % 10 AS VARCHAR) END AS addr2,
        |    n_name AS city,
        |    'S' || CAST(n_regionkey AS VARCHAR) AS state,
        |    CAST(10000 + c_custkey % 500 AS VARCHAR) AS zip,
        |    CASE WHEN c_custkey % 7 = 0 THEN CAST(40.5 AS DOUBLE) END AS lat0,
        |    CASE WHEN c_custkey % 7 = 0 THEN CAST(-75.25 AS DOUBLE) END AS lon0
        |  FROM base),
        |addr AS (
        |  SELECT *,
        |    CASE WHEN addr2 IS NULL
        |         THEN concat_ws(', ', addr1, city, state, zip)
        |         ELSE concat_ws(', ', addr1 || ' ' || addr2, city, state, zip)
        |    END AS lat_long_address
        |  FROM sites),
        |lookup AS (
        |  SELECT DISTINCT
        |    concat_ws(', ',
        |      CAST(c_custkey % 100 AS VARCHAR) || ' MAIN ST' ||
        |        CASE WHEN c_custkey % 4 = 0
        |             THEN ' APT ' || CAST(c_custkey % 10 AS VARCHAR) ELSE '' END,
        |      n_name,
        |      'S' || CAST(n_regionkey AS VARCHAR),
        |      CAST(10000 + c_custkey % 500 AS VARCHAR)) AS address,
        |    CAST((c_custkey % 500) % 120 - 60 + 0.5 AS DOUBLE) AS glat,
        |    CAST((c_custkey % 100) * 3 - 150 + 0.25 AS DOUBLE) AS glon
        |  FROM base WHERE c_custkey % 3 <> 2)
        |SELECT a.c_custkey, a.lat_long_address,
        |  CASE WHEN lat0 IS NOT NULL AND lon0 IS NOT NULL THEN lat0
        |       WHEN glat IS NOT NULL AND glon IS NOT NULL THEN glat END AS latitude,
        |  CASE WHEN lat0 IS NOT NULL AND lon0 IS NOT NULL THEN lon0
        |       WHEN glat IS NOT NULL AND glon IS NOT NULL THEN glon END AS longitude,
        |  CASE WHEN lat0 IS NOT NULL AND lon0 IS NOT NULL THEN 'carried'
        |       WHEN glat IS NOT NULL AND glon IS NOT NULL THEN 'lookup'
        |       ELSE 'missing' END AS geo_source
        |FROM addr a LEFT JOIN lookup l
        |  ON upper(trim(regexp_replace(a.lat_long_address, '\s+', ' ', 'g')))
        |   = upper(trim(regexp_replace(l.address, '\s+', ' ', 'g')))
        |ORDER BY a.c_custkey""".stripMargin,
    "q113_drift" ->
      """WITH ref AS (SELECT value FROM events WHERE event_type = 'view'),
        |cur AS (SELECT value FROM events WHERE event_type = 'click'),
        |b AS (SELECT min(value) AS lo, max(value) AS hi FROM ref),
        |rh AS (
        |  SELECT CASE WHEN value IS NULL THEN -1
        |    ELSE CAST(least(floor(least(greatest((value - lo) / (hi - lo), 0.0), 1.0) * 20), 19) AS BIGINT)
        |    END AS bin, count(*) AS n
        |  FROM ref, b GROUP BY 1),
        |rt AS (SELECT sum(n) AS tot FROM rh),
        |r2 AS (SELECT bin, n AS ref_n,
        |  CAST((n * 1000) // tot AS BIGINT) AS ref_permille FROM rh, rt),
        |ch AS (
        |  SELECT CASE WHEN value IS NULL THEN -1
        |    ELSE CAST(least(floor(least(greatest((value - lo) / (hi - lo), 0.0), 1.0) * 20), 19) AS BIGINT)
        |    END AS bin, count(*) AS n
        |  FROM cur, b GROUP BY 1),
        |ct AS (SELECT sum(n) AS tot FROM ch),
        |c2 AS (SELECT bin, n AS cur_n,
        |  CAST((n * 1000) // tot AS BIGINT) AS cur_permille FROM ch, ct)
        |SELECT bin,
        |  COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n,
        |  COALESCE(ref_permille, 0) AS ref_permille,
        |  COALESCE(cur_permille, 0) AS cur_permille,
        |  abs(COALESCE(ref_permille, 0) - COALESCE(cur_permille, 0)) AS diff_permille
        |FROM r2 FULL OUTER JOIN c2 USING (bin)
        |ORDER BY bin""".stripMargin,
    "q107_skew_report" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |t AS (SELECT sum(n_rows) AS tot FROM c),
        |top AS (
        |  SELECT l_returnflag, l_linestatus, n_rows,
        |    CAST((1000 * n_rows) // tot AS BIGINT) AS share_permille
        |  FROM c, t
        |  ORDER BY n_rows DESC, l_returnflag, l_linestatus LIMIT 4)
        |SELECT * FROM top ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q61_checksum" -> {
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
      val parts = cols.map { c =>
        s"CASE WHEN $c IS NULL THEN 'n' ELSE 'v' || length(CAST($c AS VARCHAR)) || ':' || CAST($c AS VARCHAR) END"
      }.mkString(", ")
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(CAST(${graft.functions.Hashing.h60Sql(s"concat_ws('|', $parts)")} AS HUGEINT))
         |       % ${1L << 61} AS BIGINT) AS checksum
         |FROM lineitem""".stripMargin
    },
    "q58_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "q32_clean_battery" ->
      s"""WITH $rawsCte
         |SELECT o_orderkey,
         |  CASE WHEN raw_val IN ('.', '', 'nan', 'NaN') THEN NULL ELSE raw_val END AS val_clean,
         |  'n' || regexp_replace(trim(raw_key), '\\.0$$', '') AS key_n,
         |  trim(regexp_replace(raw_ws, '\\s+', ' ', 'g')) AS ws_clean,
         |  CAST(try_strptime(replace(trim(raw_date), ' ', ''), '%m/%d/%Y') AS DATE) AS date_clean,
         |  COALESCE(CAST(try_strptime(replace(trim(
         |      CASE WHEN raw_date2 IN ('.', '', 'nan', 'NaN') THEN NULL ELSE raw_date2 END
         |    ), ' ', ''), '%m/%d/%Y') AS DATE), DATE '1999-01-09') AS date_imputed
         |FROM raw2 ORDER BY o_orderkey""".stripMargin,
    "q33_reconcile_7key" ->
      s"""WITH $downSideSql
         |SELECT pwsid, cont, sysname, sampdate, analdate, samptype, loc,
         |       result_down, result_direct
         |FROM down JOIN direct
         |  USING (pwsid, cont, sysname, sampdate, analdate, samptype, loc)
         |ORDER BY pwsid, cont, sysname, sampdate, analdate, samptype, loc,
         |         result_down, result_direct""".stripMargin,
    "q34_enrich_drop" ->
      """WITH data AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
        |              ELSE o_custkey END AS custkey,
        |         CAST(o_orderkey % 25 AS INT) AS nkey
        |  FROM orders),
        |d1 AS (SELECT c_custkey AS custkey, c_nationkey AS nkey, c_name, c_acctbal FROM customer),
        |d2 AS (SELECT c_custkey AS custkey, c_name, c_acctbal FROM customer)
        |SELECT * FROM (
        |  SELECT data.o_orderkey, data.custkey, data.nkey,
        |         CASE WHEN d1.custkey IS NOT NULL THEN d1.c_name ELSE d2.c_name END AS c_name,
        |         CASE WHEN d1.custkey IS NOT NULL THEN d1.c_acctbal ELSE d2.c_acctbal END AS c_acctbal,
        |         CASE WHEN d1.custkey IS NOT NULL THEN 1
        |              WHEN d2.custkey IS NOT NULL THEN 2 END AS match_level
        |  FROM data
        |  LEFT JOIN d1 ON data.custkey = d1.custkey AND data.nkey = d1.nkey
        |  LEFT JOIN d2 ON data.custkey = d2.custkey)
        |WHERE match_level IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q35_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,
    "q36_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,
    "q154_chunk_sample" ->
      """WITH d AS (
        |  SELECT doc_id, upper(hex(encode(text))) AS hx,
        |    octet_length(encode(text)) AS len
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |c AS (
        |  SELECT doc_id, hx, len,
        |    unnest(range(0, (len + 31) // 32)) AS chunk_id
        |  FROM d)
        |SELECT doc_id, chunk_id,
        |  CAST(least(32, len - chunk_id * 32) AS BIGINT) AS n_bytes,
        |  substr(hx, CAST(chunk_id * 64 + 1 AS BIGINT), 8) AS head_hex
        |FROM c WHERE chunk_id % 2 = 0
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q151_bmp_features" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 12 + 4 AS w, (doc_id * 3) % 10 + 4 AS h
        |  FROM documents WHERE doc_id % 10 <> 7),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |v AS (
        |  SELECT doc_id, ((y * 2) // h) * 2 + (x * 2) // w AS cell,
        |    (doc_id + 7 * x + 13 * y) % 256 AS r,
        |    (doc_id * 3 + 5 * x + 11 * y) % 256 AS g,
        |    (doc_id * 5 + 2 * x + 3 * y) % 256 AS b
        |  FROM px),
        |s AS (SELECT doc_id, cell, SUM(r) AS r, SUM(g) AS g, SUM(b) AS b
        |      FROM v GROUP BY doc_id, cell),
        |l AS (
        |  SELECT doc_id, cell * 3 AS idx, r AS v FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 1, g FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 2, b FROM s)
        |SELECT doc_id, CAST(idx AS INT) AS idx, CAST(v AS BIGINT) AS v
        |FROM l ORDER BY doc_id, idx""".stripMargin,
    "q163_png_features" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 9 + 3 AS w, (doc_id * 5) % 7 + 3 AS h
        |  FROM documents WHERE doc_id % 10 <> 7),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |v AS (
        |  SELECT doc_id, ((y * 2) // h) * 2 + (x * 2) // w AS cell,
        |    (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
        |    (doc_id * 11 + x + y * 2) % 256 AS g,
        |    (doc_id * 13 + x * 9 + y) % 256 AS b
        |  FROM px),
        |s AS (SELECT doc_id, cell, SUM(r) AS r, SUM(g) AS g, SUM(b) AS b
        |      FROM v GROUP BY doc_id, cell),
        |l AS (
        |  SELECT doc_id, cell * 3 AS idx, r AS v FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 1, g FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 2, b FROM s)
        |SELECT doc_id, CAST(idx AS INT) AS idx, CAST(v AS BIGINT) AS v
        |FROM l ORDER BY doc_id, idx""".stripMargin,
    "q169_png_palette" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 9 + 3 AS w, (doc_id * 5) % 7 + 3 AS h,
        |    doc_id % 5 + 4 AS n
        |  FROM documents WHERE doc_id % 10 <> 7),
        |xs AS (SELECT doc_id, w, h, n, unnest(range(0, w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, n, x, unnest(range(0, h)) AS y FROM xs),
        |v AS (
        |  SELECT doc_id, ((y * 2) // h) * 2 + (x * 2) // w AS cell,
        |    (doc_id * 7 + ((doc_id + x * 3 + y * 5) % n) * 29) % 256 AS r,
        |    (doc_id * 3 + ((doc_id + x * 3 + y * 5) % n) * 53) % 256 AS g,
        |    (doc_id * 11 + ((doc_id + x * 3 + y * 5) % n) * 17) % 256 AS b
        |  FROM px),
        |s AS (SELECT doc_id, cell, SUM(r) AS r, SUM(g) AS g, SUM(b) AS b
        |      FROM v GROUP BY doc_id, cell),
        |l AS (
        |  SELECT doc_id, cell * 3 AS idx, r AS v FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 1, g FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 2, b FROM s)
        |SELECT doc_id, CAST(idx AS INT) AS idx, CAST(v AS BIGINT) AS v
        |FROM l ORDER BY doc_id, idx""".stripMargin,
    "q170_gif_lzw" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 + 4 AS w, (doc_id * 3) % 6 + 3 AS h,
        |    doc_id % 5 + 4 AS n
        |  FROM documents WHERE doc_id % 10 <> 7),
        |xs AS (SELECT doc_id, w, h, n, unnest(range(0, w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, n, x, unnest(range(0, h)) AS y FROM xs),
        |v AS (
        |  SELECT doc_id, ((y * 2) // h) * 2 + (x * 2) // w AS cell,
        |    (doc_id * 5 + ((doc_id * 2 + x * 5 + y * 7) % n) * 37) % 256 AS r,
        |    (doc_id * 9 + ((doc_id * 2 + x * 5 + y * 7) % n) * 41) % 256 AS g,
        |    (doc_id * 2 + ((doc_id * 2 + x * 5 + y * 7) % n) * 59) % 256 AS b
        |  FROM px),
        |s AS (SELECT doc_id, cell, SUM(r) AS r, SUM(g) AS g, SUM(b) AS b
        |      FROM v GROUP BY doc_id, cell),
        |l AS (
        |  SELECT doc_id, cell * 3 AS idx, r AS v FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 1, g FROM s
        |  UNION ALL SELECT doc_id, cell * 3 + 2, b FROM s)
        |SELECT doc_id, CAST(idx AS INT) AS idx, CAST(v AS BIGINT) AS v
        |FROM l ORDER BY doc_id, idx""".stripMargin,
    "q171_flac_features" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 600 + 20 AS nfr, doc_id % 2 + 1 AS ch,
        |    CASE WHEN doc_id % 7 = 3 THEN 0 ELSE 1 END AS mult
        |  FROM documents),
        |s AS (SELECT doc_id, nfr, ch, mult, unnest(range(0, nfr)) AS j FROM d),
        |c AS (SELECT doc_id, nfr, ch, mult, j, unnest(range(0, ch)) AS cc FROM s),
        |v AS (
        |  SELECT doc_id, nfr, j,
        |    CASE WHEN u < 32768 THEN u ELSE u - 65536 END AS val
        |  FROM (SELECT doc_id, nfr, j,
        |          (doc_id * 97 + (j * ch + cc) * 31 * mult) % 65536 AS u FROM c)),
        |g AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN (j * 4) // nfr = 0 THEN val END) AS f0,
        |    SUM(CASE WHEN (j * 4) // nfr = 1 THEN val END) AS f1,
        |    SUM(CASE WHEN (j * 4) // nfr = 2 THEN val END) AS f2,
        |    SUM(CASE WHEN (j * 4) // nfr = 3 THEN val END) AS f3
        |  FROM v GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f0 AS BIGINT) END AS f0,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f1 AS BIGINT) END AS f1,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f2 AS BIGINT) END AS f2,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f3 AS BIGINT) END AS f3
        |FROM d JOIN g USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q172_fix_mojibake" ->
      """SELECT doc_id,
        |  text || ' Émile café 数据库 – €1,50 ™ …done #' ||
        |    CAST(doc_id AS VARCHAR) AS repaired
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q152_bmp_resize" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 12 + 4 AS w, (doc_id * 3) % 10 + 4 AS h
        |  FROM documents WHERE doc_id % 10 <> 7),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, 5)) AS x2 FROM d),
        |p2 AS (SELECT doc_id, w, h, x2, unnest(range(0, 4)) AS y2 FROM xs),
        |src AS (SELECT doc_id, (x2 * w) // 5 AS x, (y2 * h) // 4 AS y FROM p2),
        |v AS (
        |  SELECT doc_id,
        |    (doc_id + 7 * x + 13 * y) % 256 AS r,
        |    (doc_id * 3 + 5 * x + 11 * y) % 256 AS g,
        |    (doc_id * 5 + 2 * x + 3 * y) % 256 AS b
        |  FROM src),
        |s AS (SELECT doc_id, SUM(r) AS r, SUM(g) AS g, SUM(b) AS b
        |      FROM v GROUP BY doc_id),
        |l AS (
        |  SELECT doc_id, 0 AS idx, r AS v FROM s
        |  UNION ALL SELECT doc_id, 1, g FROM s
        |  UNION ALL SELECT doc_id, 2, b FROM s)
        |SELECT doc_id, CAST(idx AS INT) AS idx, CAST(v AS BIGINT) AS v
        |FROM l ORDER BY doc_id, idx""".stripMargin,
    "q150_wav_features" ->
      """WITH d AS (SELECT doc_id, doc_id % 32 + 8 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS j FROM d),
        |v AS (
        |  SELECT doc_id, (j * 4) // n AS k,
        |    CASE WHEN u < 32768 THEN u ELSE u - 65536 END AS val
        |  FROM (SELECT doc_id, n, j,
        |          (doc_id * 131 + j * 17) % 65536 AS u FROM s)),
        |g AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN k = 0 THEN val END) AS f0,
        |    SUM(CASE WHEN k = 1 THEN val END) AS f1,
        |    SUM(CASE WHEN k = 2 THEN val END) AS f2,
        |    SUM(CASE WHEN k = 3 THEN val END) AS f3
        |  FROM v GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f0 AS BIGINT) END AS f0,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f1 AS BIGINT) END AS f1,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f2 AS BIGINT) END AS f2,
        |  CASE WHEN d.doc_id % 10 = 7 THEN NULL ELSE CAST(g.f3 AS BIGINT) END AS f3
        |FROM d JOIN g USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q139_fuzzy_match" ->
      """WITH names AS (
        |  SELECT min(p_partkey) AS id, p_name AS s FROM part GROUP BY p_name),
        |segs AS (
        |  SELECT * FROM (
        |    SELECT id, s, i AS seg_idx,
        |      substr(s, 1 + (i * length(s)) // 3,
        |        ((i + 1) * length(s)) // 3 - (i * length(s)) // 3) AS seg
        |    FROM names, (VALUES (0), (1), (2)) t(i)) WHERE seg <> ''
        |  UNION ALL
        |  SELECT id, s, -1 AS seg_idx, 'L' || length(s) AS seg
        |  FROM names WHERE length(s) < 3),
        |cand AS (
        |  SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.s AS a_s, b.s AS b_s
        |  FROM segs a JOIN segs b
        |    ON a.seg_idx = b.seg_idx AND a.seg = b.seg AND a.id < b.id)
        |SELECT a_id, b_id, CAST(levenshtein(a_s, b_s) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(a_s, b_s) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    "q137_iqr_outliers" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |b AS (
        |  SELECT event_type,
        |    min(CASE WHEN rk = (n - 1) * 250 // 1000 THEN value END) AS q250,
        |    min(CASE WHEN rk = (n - 1) * 750 // 1000 THEN value END) AS q750
        |  FROM r GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n, min(b.q250) AS q250,
        |  min(b.q750) AS q750,
        |  CAST(SUM(CASE WHEN 2 * value < 2 * q250 - 3 * (q750 - q250)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo,
        |  CAST(SUM(CASE WHEN 2 * value > 2 * q750 + 3 * (q750 - q250)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi
        |FROM events e JOIN b USING (event_type)
        |WHERE value IS NOT NULL
        |GROUP BY e.event_type ORDER BY event_type""".stripMargin,
    "q128_grouped_quantiles" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents WHERE n_chars IS NOT NULL),
        |t AS (SELECT * FROM (VALUES (0),(250),(500),(750),(1000)) ps(p))
        |SELECT lang, CAST(t.p AS INT) AS permille,
        |  CAST((r.n - 1) * t.p // 1000 AS BIGINT) AS rank,
        |  n_chars AS value
        |FROM r JOIN t ON r.rk = (r.n - 1) * t.p // 1000
        |ORDER BY lang, permille, rank, value""".stripMargin,
    "q126_quantiles" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT x, row_number() OVER (ORDER BY x) - 1 AS rk FROM v),
        |t AS (SELECT p, (n - 1) * p // 1000 AS target FROM n,
        |      (VALUES (0),(100),(250),(500),(750),(900),(990),(1000)) ps(p))
        |SELECT CAST(t.p AS INT) AS permille, CAST(t.target AS BIGINT) AS rank,
        |  r.x AS value
        |FROM t JOIN r ON r.rk = t.target ORDER BY permille""".stripMargin,
    "q123_video_header" ->
      """SELECT doc_id, 'mp4' AS format,
        |  ['isom', 'mp42', 'avc1'][CAST(doc_id % 3 AS INT) + 1] AS brand,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       ELSE CAST(doc_id % 9000 + 1000 AS INT) END AS timescale,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       ELSE CAST(doc_id % 100000 + 1 AS BIGINT) END AS duration_units,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       ELSE CAST(doc_id % 1920 + 1 AS INT) END AS width,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       ELSE CAST((doc_id * 3) % 1080 + 1 AS INT) END AS height,
        |  'video/mp4' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q122_audio_header" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'wav'
        |       WHEN doc_id % 3 = 1 THEN 'flac' ELSE 'mp3' END AS format,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       WHEN doc_id % 3 = 2 THEN
        |         [44100, 48000, 32000][CAST((doc_id // 3) % 3 AS INT) + 1]
        |       ELSE CAST(doc_id % 40000 + 8000 AS INT) END AS sample_rate,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN CAST(doc_id % 2 + 1 AS INT)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 8 + 1 AS INT)
        |       ELSE CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT)
        |       END AS channels,
        |  CASE WHEN doc_id % 10 = 7 OR doc_id % 3 = 2 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN CAST(doc_id % 2 * 8 + 8 AS INT)
        |       ELSE 16 END AS bits_per_sample,
        |  CASE WHEN doc_id % 10 = 7 OR doc_id % 3 = 2 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN CAST(doc_id % 1000 + 1 AS BIGINT)
        |       ELSE CAST(doc_id % 100000 + 1 AS BIGINT) END AS n_samples,
        |  CASE WHEN doc_id % 3 = 0 THEN 'audio/wav'
        |       WHEN doc_id % 3 = 1 THEN 'audio/flac'
        |       ELSE 'audio/mpeg' END AS mime
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q120_image_header" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       ELSE CAST(doc_id % 800 + 1 AS INT) END AS width,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       ELSE CAST((doc_id * 7) % 600 + 1 AS INT) END AS height,
        |  CASE WHEN doc_id % 10 = 7 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN
        |         CAST([1, 3, 1, 2, 4][CAST(doc_id % 5 AS INT) + 1] AS INT)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 2 * 2 + 1 AS INT)
        |       ELSE 3 END AS channels,
        |  CASE WHEN doc_id % 3 = 1 THEN
        |         CAST(doc_id % 6 = 1 AND doc_id % 10 <> 7 AS INT)
        |       ELSE NULL END AS exif,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'image/jpeg'
        |       ELSE 'image/gif' END AS mime
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q37_multimodal" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3
        |      WHEN 0 THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB || encode(text)
        |      WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
        |      ELSE encode(text) END AS bytes
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(octet_length(bytes) AS BIGINT) AS n_bytes,
        |  CASE WHEN substring(hex(bytes), 1, 8) = '89504E47' THEN 'image/png'
        |       WHEN substring(hex(bytes), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
        |       WHEN substring(hex(bytes), 1, 6) = '494433' THEN 'audio/mpeg'
        |       ELSE 'application/octet-stream' END AS mime,
        |  sha256(hex(bytes)) AS sha_hex,
        |  CAST(ceil(octet_length(bytes) / 256.0) AS BIGINT) AS n_chunks,
        |  CASE WHEN octet_length(bytes) <= 16 THEN hex(bytes) ELSE (
        |    SELECT string_agg(
        |      substring(hex(a.bytes), CAST(i * octet_length(a.bytes) // 16 AS BIGINT) * 2 + 1, 2),
        |      '' ORDER BY i)
        |    FROM generate_series(0, 15) AS t(i)) END AS thumb_hex
        |FROM a ORDER BY doc_id""".stripMargin)
}
