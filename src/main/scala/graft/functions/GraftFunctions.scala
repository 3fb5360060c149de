package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.unsafe.types.UTF8String

/** Column-API and SQL-registry surface for graft's native expressions —
  * the Spark analogue of the reference's `CREATE EXTENSION postgis/vector`
  * (`backend/load_data.py:67-68`): one call registers every function in the
  * session's FunctionRegistry so both the fluent API and `spark.sql` can
  * use them.
  */
object GraftFunctions {

  private[graft] def toCol(e: Expression): Column = GraftColumnBridge.column(e)
  private[graft] def toExpr(c: Column): Expression = GraftColumnBridge.expression(c)

  // --- vector --------------------------------------------------------------
  def cosine_distance(a: Column, b: Column): Column = toCol(CosineDistance(toExpr(a), toExpr(b)))
  def dot_product(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
  def l2_distance(a: Column, b: Column): Column = toCol(L2Distance(toExpr(a), toExpr(b)))
  def l2_norm(a: Column): Column = toCol(L2Norm(toExpr(a)))
  def l2_normalize(a: Column): Column = toCol(L2Normalize(toExpr(a)))

  /** Per-group element-wise vector mean (decimal-exact; see
    * [[VectorCentroid]]) — one fixed-width buffer per group instead of a
    * rows x dim posexplode shuffle.
    */
  def vector_centroid(emb: Column): Column =
    toCol(VectorCentroid(toExpr(emb)).toAggregateExpression())
  def quantize_int8(a: Column): Column = toCol(QuantizeInt8(toExpr(a)))
  def dequantize_int8(a: Column): Column = toCol(DequantizeInt8(toExpr(a)))
  def binary_quantize(a: Column): Column = toCol(BinaryQuantize(toExpr(a)))
  def hamming_distance(a: Column, b: Column): Column =
    toCol(HammingDistance(toExpr(a), toExpr(b)))

  /** Misra–Gries frequent-items sketch (candidates + lower bounds; see
    * [[MisraGries]]) — fixed k-entry buffer per partition, shuffle volume
    * `partitions x k` regardless of vocabulary size.
    */
  def misra_gries(item: Column, k: Int): Column =
    toCol(MisraGries(toExpr(item), k).toAggregateExpression())

  /** Bounded top-k-per-group (see [[TopKBy]]): keep the k smallest
    * payload rows by the `ord` struct — the per-group
    * TakeOrderedAndProject the window formulation lacks.
    */
  def topk_by(ord: Column, payload: Column, k: Int): Column =
    toCol(TopKBy(toExpr(ord), toExpr(payload), k).toAggregateExpression())

  /** A float-array literal (probe vectors etc.). */
  def vector_lit(xs: Array[Float]): Column =
    org.apache.spark.sql.functions.typedLit(xs)

  // --- spatial (reference PostGIS surface, SURVEY.md §2.7) -----------------
  def st_point(lon: Column, lat: Column): Column =
    toCol(STPoint(toExpr(lon.cast("double")), toExpr(lat.cast("double"))))
  def st_geomfromtext(wkt: Column): Column = toCol(STGeomFromText(toExpr(wkt)))
  def st_astext(wkb: Column): Column = toCol(STAsText(toExpr(wkb)))
  def st_intersects(a: Column, b: Column): Column = toCol(STIntersects(toExpr(a), toExpr(b)))
  def st_contains(a: Column, b: Column): Column = toCol(STContains(toExpr(a), toExpr(b)))
  def st_within(a: Column, b: Column): Column = toCol(STWithin(toExpr(a), toExpr(b)))
  def st_distance(a: Column, b: Column): Column = toCol(STDistance(toExpr(a), toExpr(b)))
  /** Great-circle meters between POINTs — see [[STDistanceSphere]]. */
  def st_distance_sphere(a: Column, b: Column): Column =
    toCol(STDistanceSphere(toExpr(a), toExpr(b)))
  def st_area(g: Column): Column = toCol(STArea(toExpr(g)))
  def st_envelope(g: Column): Column = toCol(STEnvelope(toExpr(g)))
  def st_try_envelope(g: Column): Column =
    toCol(STEnvelope(toExpr(g), failOnError = false))
  def st_centroid(g: Column): Column = toCol(STCentroid(toExpr(g)))
  def st_buffer(g: Column, d: Column): Column =
    toCol(STBuffer(toExpr(g), toExpr(d.cast("double"))))
  def st_geometrytype(a: Column): Column = toCol(STGeometryType(toExpr(a)))
  def st_try_geometrytype(a: Column): Column =
    toCol(STGeometryType(toExpr(a), failOnError = false))
  def st_setsrid(a: Column, srid: Column): Column =
    toCol(STSetSrid(toExpr(a), toExpr(srid.cast("int"))))
  def st_srid(a: Column): Column = toCol(STSrid(toExpr(a)))
  def st_transform_point(x: Column, y: Column, src: Column, dst: Column): Column =
    toCol(STTransformPoint(Seq(toExpr(x.cast("double")), toExpr(y.cast("double")),
      toExpr(src.cast("int")), toExpr(dst.cast("int")))))
  def morton_code(lon: Column, lat: Column): Column =
    toCol(MortonCode(toExpr(lon.cast("double")), toExpr(lat.cast("double"))))

  // --- multimodal ----------------------------------------------------------
  /** Real image-container header parse (PNG/JPEG/GIF) — see [[ImageMeta]]. */
  def image_meta(bytes: Column): Column = toCol(ImageMeta(toExpr(bytes)))
  /** PNG pixel decode (inflate + filter reconstruction) to exact stats — see [[ImagePixelStats]]. */
  def image_pixel_stats(bytes: Column): Column = toCol(ImagePixelStats(toExpr(bytes)))
  /** GIF LZW pixel decode to exact palette-index stats — see [[GifPixelStats]]. */
  def gif_pixel_stats(bytes: Column): Column = toCol(GifPixelStats(toExpr(bytes)))
  /** Animated-GIF frame/duration walk (no decode) — see [[GifFrames]]. */
  def gif_frames(bytes: Column): Column = toCol(GifFrames(toExpr(bytes)))
  /** BMP (24-bit BI_RGB) pixel decode to exact per-channel stats — see [[BmpPixelStats]]. */
  def bmp_pixel_stats(bytes: Column): Column = toCol(BmpPixelStats(toExpr(bytes)))

  def jpeg_pixel_stats(bytes: Column): Column = toCol(JpegPixelStats(toExpr(bytes)))

  def jpeg_rgb_stats(bytes: Column): Column = toCol(JpegRgbStats(toExpr(bytes)))
  def bmp_ahash(bytes: Column): Column = toCol(BmpAhash(toExpr(bytes)))
  /** WARC (ISO 28500) record splitter — see [[WarcRecords]]. */
  def warc_records(bytes: Column): Column = toCol(WarcRecords(toExpr(bytes)))
  /** Multi-member GZIP inflation with bomb refusal — see [[Gunzip]]. */
  def gunzip(bytes: Column): Column = toCol(Gunzip(toExpr(bytes)))
  /** Zstandard (RFC 8878) inflation, same posture — see [[Zunstd]]. */
  def zunstd(bytes: Column): Column = toCol(Zunstd(toExpr(bytes)))
  /** XZ/LZMA2 inflation, same posture — see [[Zunxz]]. */
  def zunxz(bytes: Column): Column = toCol(Zunxz(toExpr(bytes)))
  /** Little-endian fixed-width hex of an integral — see [[LeHex]]. */
  def le_hex(v: Column, width: Int): Column = toCol(LeHex(toExpr(v), width))
  /** BZIP2 inflation, same posture — see [[Zunbz2]]. */
  def zunbz2(bytes: Column): Column = toCol(Zunbz2(toExpr(bytes)))
  /** BZIP2 compression (write + fixture seam) — see [[Bzip2Deflate]]. */
  def bzip2_deflate(bytes: Column): Column = toCol(Bzip2Deflate(toExpr(bytes)))
  /** LZ4 frame inflation, same posture — see [[Zunlz4]]. */
  def zunlz4(bytes: Column): Column = toCol(Zunlz4(toExpr(bytes)))
  /** ZIP central-directory listing — see [[ZipEntries]]. */
  def zip_entries(bytes: Column): Column = toCol(ZipEntries(toExpr(bytes)))
  /** One ZIP entry's bytes, CRC-verified — see [[ZipExtract]]. */
  def zip_extract(bytes: Column, name: Column): Column =
    toCol(ZipExtract(toExpr(bytes), toExpr(name)))
  /** TAR (ustar) header walk — see [[TarEntries]]. */
  def tar_entries(bytes: Column): Column = toCol(TarEntries(toExpr(bytes)))
  /** One TAR regular file's bytes, bounds-checked — see [[TarExtract]]. */
  def tar_extract(bytes: Column, name: Column): Column =
    toCol(TarExtract(toExpr(bytes), toExpr(name)))
  /** OLE2/CFB compound-file directory walk — see [[CfbEntries]]. */
  def cfb_entries(bytes: Column): Column = toCol(CfbEntries(toExpr(bytes)))
  /** One CFB stream's bytes (FAT or miniFAT chain) — see [[CfbExtract]]. */
  def cfb_extract(bytes: Column, name: Column): Column =
    toCol(CfbExtract(toExpr(bytes), toExpr(name)))
  /** Legacy Word piece-table text extraction — see [[DocText]]. */
  def doc_text(bytes: Column): Column = toCol(DocText(toExpr(bytes)))
  /** Legacy Excel BIFF8 cell extraction — see [[XlsCells]]. */
  def xls_cells(bytes: Column): Column = toCol(XlsCells(toExpr(bytes)))
  /** BOM/UTF-8/fallback charset sniff — see [[CharsetDetect]]. */
  def charset_detect(bytes: Column): Column = toCol(CharsetDetect(toExpr(bytes)))
  /** Strict decode on the detected branch — see [[CharsetDecode]]. */
  def charset_decode(bytes: Column): Column = toCol(CharsetDecode(toExpr(bytes)))
  /** HTML decode with the WHATWG meta prescan — see [[CharsetDecodeHtml]]. */
  def charset_decode_html(bytes: Column): Column = toCol(CharsetDecodeHtml(toExpr(bytes)))
  /** Audio-container header parse (WAV/MP3) — see [[AudioMeta]]. */
  def audio_meta(bytes: Column): Column = toCol(AudioMeta(toExpr(bytes)))
  /** WAV PCM16 payload decode to exact sample stats — see [[AudioPcmStats]]. */
  def audio_pcm_stats(bytes: Column): Column = toCol(AudioPcmStats(toExpr(bytes)))
  /** Full MP3 frame walk (VBR-safe duration) — see [[Mp3Frames]]. */
  def mp3_frames(bytes: Column): Column = toCol(Mp3Frames(toExpr(bytes)))
  /** FLAC STREAMINFO walk (rate/channels/bits/samples/md5) — see [[FlacStreaminfo]]. */
  def flac_streaminfo(bytes: Column): Column = toCol(FlacStreaminfo(toExpr(bytes)))
  /** MJPEG frame payloads out of an AVI container — see [[AviFrames]]. */
  def avi_frames(bytes: Column): Column = toCol(AviFrames(toExpr(bytes)))
  /** OGG page walk + Opus/Vorbis ID header — see [[OggMeta]]. */
  def ogg_meta(bytes: Column): Column = toCol(OggMeta(toExpr(bytes)))
  /** RFC 3533 page CRC (unreflected 0x04C11DB7) — see [[OggCrc]]. */
  def ogg_crc(bytes: Column): Column = toCol(OggCrc(toExpr(bytes)))
  /** PDF metadata (version/pages/objects) — see [[PdfMeta]]. */
  def pdf_meta(bytes: Column): Column = toCol(PdfMeta(toExpr(bytes)))
  /** PDF text extraction (Tj/TJ walk) — see [[PdfText]]. */
  def pdf_text(bytes: Column): Column = toCol(PdfText(toExpr(bytes)))
  /** PDF document-information dictionary — see [[PdfInfo]]. */
  def pdf_info(bytes: Column): Column = toCol(PdfInfo(toExpr(bytes)))

  // --- web corpus ----------------------------------------------------------
  /** RFC 9309 robots.txt evaluation for a fixed agent — see [[RobotsAllowed]]. */
  def robots_allowed(robotsTxt: Column, path: Column, agent: String): Column =
    toCol(RobotsAllowed(toExpr(robotsTxt), toExpr(path), agent))
  /** Crawl-delay seconds for a fixed agent (default when absent) — see
    * [[RobotsCrawlDelay]].
    */
  def robots_crawl_delay(robotsTxt: Column, default: Column, agent: String): Column =
    toCol(RobotsCrawlDelay(toExpr(robotsTxt), toExpr(default.cast("bigint")), agent))
  /** `Sitemap:` discovery URLs in file order — see [[RobotsSitemaps]]. */
  def robots_sitemaps(robotsTxt: Column): Column =
    toCol(RobotsSitemaps(toExpr(robotsTxt)))
  /** RFC 3986 syntax normalization — see [[UrlCanonicalize]]. */
  def url_canonicalize(url: Column): Column = toCol(UrlCanonicalize(toExpr(url)))
  /** Lowercased host of a URL — see [[UrlHost]]. */
  def url_host(url: Column): Column = toCol(UrlHost(toExpr(url)))
  /** Video-container header parse (MP4/AVI) — see [[VideoMeta]]. */
  def video_meta(bytes: Column): Column = toCol(VideoMeta(toExpr(bytes)))

  // --- sketch hashes (near-dup detection) ----------------------------------
  def minhash_signature(tokens: Column, numHashes: Int): Column =
    toCol(MinHashSignature(toExpr(tokens), numHashes))
  def simhash64(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))
  def rolling_hash(text: Column): Column = toCol(RollingHash64(toExpr(text)))
  /** FNV-1a 64 of a string's UTF-8 bytes — see [[Fnv64]]. `mixed` adds
    * the splitmix64 finalizer (required when reading high bits).
    */
  def fnv64(s: Column, mixed: Boolean = false): Column =
    toCol(Fnv64(toExpr(s), mixed))
  /** Content-defined chunk list (LBFS cut rule) — see [[CdcChunksExpr]]. */
  def cdc_chunks(text: Column, divisor: Int): Column =
    toCol(CdcChunksExpr(toExpr(text), divisor))
  def hashing_tf(tokens: Column, dim: Int): Column =
    toCol(HashingTfVector(toExpr(tokens), dim))
  def hyperplane_bands(emb: Column, bands: Int, rows: Int, seed: Long): Column =
    toCol(HyperplaneBands(toExpr(emb), bands, rows, seed))
  /** Count-Min bucket row (one bucket per sketch row) — see [[CmBuckets]]. */
  def cm_buckets(s: Column, depth: Int, width: Int): Column =
    toCol(CmBuckets(toExpr(s), depth, width))
  /** Integer-exact +-1 JL projection — see [[SignedProject]]. */
  def signed_project(emb: Column, k: Int, seed: Long): Column =
    toCol(SignedProject(toExpr(emb), k, seed))
  /** Unicode NFC normalization (UAX #15) — see [[NfcNormalize]]. */
  def nfc_normalize(s: Column): Column = toCol(NfcNormalize(toExpr(s)))

  private val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_distance" -> { es => CosineDistance(es(0), es(1)) },
    "dot_product"     -> { es => DotProduct(es(0), es(1)) },
    "l2_distance"     -> { es => L2Distance(es(0), es(1)) },
    "l2_norm"         -> { es => L2Norm(es(0)) },
    "l2_normalize"    -> { es => L2Normalize(es(0)) },
    "quantize_int8"   -> { es => QuantizeInt8(es(0)) },
    "dequantize_int8" -> { es => DequantizeInt8(es(0)) },
    "binary_quantize" -> { es => BinaryQuantize(es(0)) },
    "hamming_distance" -> { es => HammingDistance(es(0), es(1)) },
    "st_point"        -> { es => STPoint(cast(es(0), "double"), cast(es(1), "double")) },
    "st_geomfromtext" -> { es => STGeomFromText(es(0)) },
    "st_astext"       -> { es => STAsText(es(0)) },
    "st_intersects"   -> { es => STIntersects(es(0), es(1)) },
    "st_contains"     -> { es => STContains(es(0), es(1)) },
    "st_within"       -> { es => STWithin(es(0), es(1)) },
    "st_distance"     -> { es => STDistance(es(0), es(1)) },
    "st_distance_sphere" -> { es => STDistanceSphere(es(0), es(1)) },
    "st_geometrytype" -> { es => STGeometryType(es(0)) },
    "st_area"         -> { es => STArea(es(0)) },
    "st_envelope"     -> { es => STEnvelope(es(0)) },
    "st_try_envelope" -> { es => STEnvelope(es(0), failOnError = false) },
    "st_centroid"     -> { es => STCentroid(es(0)) },
    "st_buffer"       -> { es => STBuffer(es(0), es(1)) },
    "st_setsrid"      -> { es => STSetSrid(es(0), cast(es(1), "int")) },
    "st_srid"         -> { es => STSrid(es(0)) },
    "rolling_hash"    -> { es => RollingHash64(es(0)) },
    "morton_code"     -> { es => MortonCode(cast(es(0), "double"), cast(es(1), "double")) },
    "simhash64"       -> { es => SimHash64(es(0)) },
    "html_to_markdown" -> { es => HtmlToMarkdown(es(0)) },
    "html_to_markdown_blocks" -> { es => HtmlToMarkdownBlocks(es(0)) },
    "image_meta"      -> { es => ImageMeta(es(0)) },
    "image_pixel_stats" -> { es => ImagePixelStats(es(0)) },
    "gif_pixel_stats" -> { es => GifPixelStats(es(0)) },
    "bmp_pixel_stats" -> { es => BmpPixelStats(es(0)) },
    "jpeg_pixel_stats" -> { es => JpegPixelStats(es(0)) },
    "jpeg_rgb_stats" -> { es => JpegRgbStats(es(0)) },
    "bmp_ahash" -> { es => BmpAhash(es(0)) },
    "warc_records" -> { es => WarcRecords(es(0)) },
    "gunzip" -> { es => Gunzip(es(0)) },
    "zunstd" -> { es => Zunstd(es(0)) },
    "zunxz" -> { es => Zunxz(es(0)) },
    "le_hex" -> { es => LeHex(es(0),
      es(1).eval().asInstanceOf[Number].intValue()) },
    "zunbz2" -> { es => Zunbz2(es(0)) },
    "bzip2_deflate" -> { es => Bzip2Deflate(es(0)) },
    "zunlz4" -> { es => Zunlz4(es(0)) },
    "zip_entries" -> { es => ZipEntries(es(0)) },
    "zip_extract" -> { es => ZipExtract(es(0), es(1)) },
    "tar_entries" -> { es => TarEntries(es(0)) },
    "tar_extract" -> { es => TarExtract(es(0), es(1)) },
    "charset_detect" -> { es => CharsetDetect(es(0)) },
    "charset_decode" -> { es => CharsetDecode(es(0)) },
    "charset_decode_html" -> { es => CharsetDecodeHtml(es(0)) },
    "fnv64" -> { es => Fnv64(es(0)) },
    "nfc_normalize" -> { es => NfcNormalize(es(0)) },
    "cm_buckets" -> { es => CmBuckets(es(0),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].intValue()) },
    "cdc_chunks" -> { es => CdcChunksExpr(es(0),
      es(1).eval().asInstanceOf[Number].intValue()) },
    "audio_meta"      -> { es => AudioMeta(es(0)) },
    "audio_pcm_stats" -> { es => AudioPcmStats(es(0)) },
    "mp3_frames"      -> { es => Mp3Frames(es(0)) },
    "flac_streaminfo" -> { es => FlacStreaminfo(es(0)) },
    "avi_frames"      -> { es => AviFrames(es(0)) },
    "ogg_meta"        -> { es => OggMeta(es(0)) },
    "ogg_crc"         -> { es => OggCrc(es(0)) },
    "pdf_meta"        -> { es => PdfMeta(es(0)) },
    "pdf_text"        -> { es => PdfText(es(0)) },
    "pdf_info"        -> { es => PdfInfo(es(0)) },
    "gif_frames"      -> { es => GifFrames(es(0)) },
    "url_canonicalize" -> { es => UrlCanonicalize(es(0)) },
    "robots_allowed" -> { es => RobotsAllowed(es(0), es(1), literalString("robots_allowed",
      "(string robots_txt, string path, string-literal agent)", es(2))) },
    "robots_sitemaps" -> { es => RobotsSitemaps(es(0)) },
    "robots_crawl_delay" -> { es => RobotsCrawlDelay(es(0), cast(es(1), "bigint"),
      literalString("robots_crawl_delay",
        "(string robots_txt, bigint default, string-literal agent)", es(2))) },
    "url_host"        -> { es => UrlHost(es(0)) },
    "video_meta"      -> { es => VideoMeta(es(0)) },
    "st_transform_point" -> { es => STTransformPoint(Seq(
      cast(es(0), "double"), cast(es(1), "double"), cast(es(2), "int"), cast(es(3), "int"))) },
  )

  /** SQL-registry helper: require a foldable string argument (e.g. the
    * agent token baked into the expression at build time) and raise a
    * clean AnalysisException — not a ClassCastException — when the call
    * site passes a non-literal or non-string.
    */
  private def literalString(fn: String, signature: String, e: Expression): String = {
    val ok = e.foldable &&
      e.dataType == org.apache.spark.sql.types.StringType
    if (!ok)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          s"$fn expects $signature; the agent argument must be a string literal, got ${e.sql}"))
    val v = e.eval()
    if (v == null)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          s"$fn expects $signature; the agent argument must not be NULL"))
    v.asInstanceOf[UTF8String].toString
  }

  /** SQL-registry helper: cast an argument expression to the expected type. */
  private def cast(e: Expression, to: String): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(to))

  /** Register every graft function for SQL use in this session. Idempotent. */
  def register(spark: SparkSession): Unit = synchronized {
    val fr = spark.sessionState.functionRegistry
    registry.foreach { case (name, builder) =>
      fr.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Builder-time registration for `withExtensions` / spark.sql.extensions
    * (see [[graft.plans.GraftExtensions]]).
    */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    registry.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", name),
        builder))
    }
}
