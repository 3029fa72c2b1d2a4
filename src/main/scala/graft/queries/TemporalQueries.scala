package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._
import Hygiene._

/** Temporal/advanced-join suite: as-of join (window-over-union
  * formulation, SURVEY §2.4), range/theta join, multimodal metadata
  * pipeline, and gap-based sessionization. */
object TemporalQueries {

  /** x10/x33 shared oracle CTE: the closed-form DECODED metadata of the
    * real per-modality fixture containers (PNG dims / WAV frame count /
    * MP4 tkhd dims + mvhd duration) — the oracle never sees bytes, so a
    * stubbed or wrong decode hash-mismatches (the x44/x51/x57 contract,
    * applied to the whole media table). */
  private val mediaMetaCte = """
      m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 16
                    WHEN doc_id % 3 = 1 THEN 0
                    ELSE 16 + doc_id % 112 END AS width,
               CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 8
                    WHEN doc_id % 3 = 1 THEN 0
                    ELSE 16 + doc_id % 64 END AS height,
               CASE WHEN doc_id % 3 = 0 THEN 1
                    WHEN doc_id % 3 = 1 THEN 64 + doc_id % 128
                    ELSE 8 + doc_id % 24 END AS n_frames
        FROM documents)"""

  // --- X10: multimodal decode pipeline — REAL container bytes per
  // modality (PNG/WAV/MP4 from the doc_id fixtures) → real decode
  // dispatch → typed metadata → per-modality stats.
  val x10 = Query(
    "x10_multimodal_meta",
    Some(s"""
      WITH $mediaMetaCte
      SELECT mime,
             CAST(COUNT(*) AS BIGINT) AS n_media,
             CAST(SUM(width) AS BIGINT) AS sum_width,
             CAST(SUM(height) AS BIGINT) AS sum_height,
             CAST(SUM(n_frames) AS BIGINT) AS sum_frames
      FROM m GROUP BY mime
      ORDER BY mime""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.modalityStats(Multimodal.decode(Multimodal.mediaTable(documents(s, d))))
      .orderBy("mime")
  }

  // --- X33: multimodal frame sampling — real decode metadata → k
  // evenly-spaced frame indices per media row (the pre-extraction step of
  // any video pipeline; decimation grid floor(j·n_frames/k)). The oracle
  // replays the closed-form decoded frame counts plus the same grid.
  val x33 = Query(
    "x33_multimodal_frames",
    Some(s"""
      WITH $mediaMetaCte
      SELECT doc_id, mime,
             CAST(n_frames AS INT) AS n_frames,
             array_to_string(list_transform(range(0, 3),
               j -> CAST(floor(j * n_frames / 3) AS INT)), ',') AS frame_idx
      FROM m
      ORDER BY doc_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.sampleFrames(
        Multimodal.decode(Multimodal.mediaTable(documents(s, d))), k = 3)
      .select("doc_id", "mime", "n_frames", "frame_idx")
      .orderBy("doc_id")
  }

  // --- X57: REAL video container metadata — a pure-JVM ISO-BMFF box walk
  // over real MP4 bytes (ftyp brand, mvhd timescale/duration, trak count,
  // tkhd 16.16 dimensions), the x51-RIFF pattern applied to video. The
  // oracle states the decoded metadata in closed form from doc_id; the
  // decoder must navigate the actual length-prefixed box tree (including
  // skipping free/mdat) to reproduce it.
  val x57 = Query(
    "x57_multimodal_video",
    Some("""
      SELECT doc_id,
             'isom' AS brand,
             CAST(24 AS INT) AS timescale,
             CAST(8 + doc_id % 24 AS BIGINT) AS duration_units,
             CAST(1 + doc_id % 3 AS INT) AS n_tracks,
             CAST(16 + doc_id % 112 AS INT) AS width,
             CAST(16 + doc_id % 64 AS INT) AS height,
             CAST(1 AS INT) AS ok_ftyp
      FROM documents WHERE doc_id % 20 = 0
      ORDER BY doc_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.decodeMp4(
        Multimodal.encodeMp4(documents(s, d).filter(col("doc_id") % 20 === 0)))
      .toDF()
      .orderBy("doc_id")
  }

  // --- X44: REAL image codec round-trip (javax.imageio): encode a
  // deterministic grayscale PNG per selected doc, then decode ACTUAL
  // bytes — signature check, IHDR dims, zlib-inflated pixels — and
  // derive metadata from the decoded raster. The oracle never sees the
  // bytes: it states the closed-form expectations (dims from doc_id,
  // px_sum = Σ (id·31+x·7+y) mod 256), so any codec lie (stubbed decode,
  // wrong scanline math) hash-mismatches. Byte COUNT is deliberately not
  // compared — PNG encoder output is JDK-version-dependent; pixel content
  // is not.
  val x44 = Query(
    "x44_multimodal_codec",
    Some("""
      WITH sel AS (
        SELECT doc_id,
               CAST(1 + doc_id % 16 AS INT) AS width,
               CAST(1 + doc_id % 8 AS INT) AS height
        FROM documents WHERE doc_id % 20 = 0),
      xs AS (SELECT doc_id, width, height, unnest(range(0, width)) AS x FROM sel),
      px AS (SELECT doc_id, width, height, x, unnest(range(0, height)) AS y FROM xs)
      SELECT doc_id, 'image/png' AS mime, width, height,
             CAST(SUM((doc_id * 31 + x * 7 + y) % 256) AS BIGINT) AS px_sum,
             CAST(1 AS INT) AS ok_sig
      FROM px
      GROUP BY doc_id, width, height
      ORDER BY doc_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.decodePng(
        Multimodal.encodePng(documents(s, d).filter(col("doc_id") % 20 === 0)))
      .toDF()
      .orderBy("doc_id")
  }

  // --- X50: REAL resize stage — decode → nearest-neighbor downsample to
  // 8×4 → re-encode (signature-checked), completing the multimodal verb
  // set (decode / feature-extract / RESIZE / frame-sample). Target (x,y)
  // reads source (⌊x·sw/8⌋, ⌊y·sh/4⌋); source pixels are the closed-form
  // fixture values, so the oracle states the resized pixel sum without
  // seeing bytes — a wrong raster index or a stubbed resize mismatches.
  val x50 = Query(
    "x50_multimodal_resize",
    Some("""
      WITH sel AS (
        SELECT doc_id,
               CAST(1 + doc_id % 16 AS INT) AS src_w,
               CAST(1 + doc_id % 8 AS INT) AS src_h
        FROM documents WHERE doc_id % 20 = 0),
      xs AS (SELECT doc_id, src_w, src_h, unnest(range(0, 8)) AS x FROM sel),
      px AS (SELECT doc_id, src_w, src_h, x, unnest(range(0, 4)) AS y FROM xs)
      SELECT doc_id, src_w, src_h,
             CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
             CAST(SUM((doc_id * 31 + (x * src_w // 8) * 7 + (y * src_h // 4)) % 256)
               AS BIGINT) AS px_sum,
             CAST(1 AS INT) AS ok_reencode
      FROM px
      GROUP BY doc_id, src_w, src_h
      ORDER BY doc_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.resizePng(
        Multimodal.encodePng(documents(s, d).filter(col("doc_id") % 20 === 0)),
        tw = 8, th = 4)
      .toDF()
      .orderBy("doc_id")
  }

  // --- Y08: image perceptual-hash near-dup — the image-level dedup
  // family: real PNG corpus with planted re-encoded duplicates (2× NN
  // upscale — dHash-identical by the floor identity) and near-duplicates
  // (+9 brightness shift — a few gradient-wrap bits move), dHash over the
  // DECODED rasters, Hamming-banded candidate join (the y07 pigeonhole
  // plan: 4×16-bit bands cover Hamming ≤ 3 exactly; never all-pairs).
  // The oracle replays the IDENTICAL integer pipeline in closed form —
  // fixture pixels, the x50 NN index arithmetic (for the upscaled copy
  // ⌊⌊x·2w/9⌋/2⌋, for the shift (v+9) mod 256), the same 64 gradient
  // bits packed into the same two halves, brute-force Hamming ≤ 3 —
  // so a wrong decode, raster index, bit order, or band/uniqueness bug
  // in the join all hash-mismatch.
  val y08 = Query(
    "y08_image_neardup",
    Some("""
      WITH sel AS (
        SELECT doc_id, CAST(1 + doc_id % 16 AS INT) AS w,
               CAST(1 + doc_id % 8 AS INT) AS h
        FROM documents WHERE doc_id % 5 = 0),
      imgs AS (
        SELECT doc_id AS img_id, 'orig' AS kind, doc_id AS src,
               0 AS shift, w, h, 1 AS sc FROM sel
        UNION ALL
        SELECT doc_id + 10000000, 'resized', doc_id, 0, w, h, 2
        FROM sel WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 20000000, 'shifted', doc_id, 9, w, h, 1
        FROM sel WHERE doc_id % 10 = 5),
      xs AS (SELECT *, unnest(range(0, 9)) AS x FROM imgs),
      g AS (SELECT *, unnest(range(0, 8)) AS y FROM xs),
      px AS (
        SELECT img_id, kind, x, y,
               (src * 31 + ((x * (w * sc) // 9) // sc) * 7
                + ((y * (h * sc) // 8) // sc) + shift) % 256 AS v
        FROM g),
      bits AS (
        SELECT a.img_id, a.kind, a.x, a.y,
               CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        FROM px a JOIN px b
          ON a.img_id = b.img_id AND b.x = a.x + 1 AND b.y = a.y
        WHERE a.x < 8),
      hs AS (
        SELECT img_id, kind,
               CAST(SUM(CASE WHEN y >= 4
                 THEN bit * (1::BIGINT << ((y - 4) * 8 + x)) ELSE 0 END)
                 AS BIGINT) AS hash_hi,
               CAST(SUM(CASE WHEN y < 4
                 THEN bit * (1::BIGINT << (y * 8 + x)) ELSE 0 END)
                 AS BIGINT) AS hash_lo
        FROM bits GROUP BY img_id, kind),
      pairs AS (
        SELECT a.img_id AS ai, b.img_id AS bi
        FROM hs a JOIN hs b ON a.img_id < b.img_id
        WHERE bit_count(xor(a.hash_hi, b.hash_hi))
            + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
      nd AS (
        SELECT img_id, COUNT(*) AS n_dup
        FROM (SELECT ai AS img_id FROM pairs
              UNION ALL SELECT bi FROM pairs)
        GROUP BY img_id),
      shadowed AS (SELECT DISTINCT bi AS img_id FROM pairs)
      SELECT h.img_id, h.kind, h.hash_hi, h.hash_lo,
             CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup,
             (shadowed.img_id IS NULL) AS kept
      FROM hs h
      LEFT JOIN nd ON h.img_id = nd.img_id
      LEFT JOIN shadowed ON h.img_id = shadowed.img_id
      ORDER BY h.img_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.imageNearDup(
        Multimodal.dHashPng(Multimodal.imageCorpus(documents(s, d))).toDF())
      .orderBy("img_id")
  }

  // --- Y11: audio band-fingerprint near-dup — y08's dedup family for
  // the audio modality: real WAV corpus with planted GAIN ×2 re-encodes
  // (fingerprint-identical: energies scale by exactly 4, zero crossings
  // are sign-invariant, so every gradient bit survives) and +25 DC
  // offsets (a few band-energy/ZCR comparisons flip — the near-dup
  // family), the 32-band energy/zero-crossing gradient fingerprint over
  // DECODED PCM frames, and the same Hamming-banded candidate join as
  // y08. The oracle replays the whole integer pipeline in closed form —
  // fixture samples, band(i) = i·32 // n, exact Σx² energies, strict
  // x·x' < 0 crossings, the same 62-bit packing, brute-force Hamming ≤ 3
  // — so a stubbed decode, band-index slip, or join bug hash-mismatches.
  val y11 = Query(
    "y11_audio_neardup",
    Some("""
      WITH sel AS (
        SELECT doc_id, 64 + doc_id % 128 AS n
        FROM documents WHERE doc_id % 5 = 0),
      auds AS (
        SELECT doc_id AS aud_id, 'orig' AS kind, doc_id AS src,
               1 AS g, 0 AS dc, n FROM sel
        UNION ALL
        SELECT doc_id + 30000000, 'gain', doc_id, 2, 0, n
        FROM sel WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 40000000, 'dcshift', doc_id, 1, 25, n
        FROM sel WHERE doc_id % 10 = 5),
      smp AS (
        SELECT aud_id, kind, n,
               unnest(range(0, n)) AS i,
               g, dc, src
        FROM auds),
      xv AS (
        SELECT aud_id, kind, n, i, CAST(i * 32 // n AS INT) AS band,
               g * ((src * 7 + i * 13) % 2003 - 1001) + dc AS v
        FROM smp),
      en AS (
        SELECT aud_id, kind, band,
               CAST(SUM(v * v) AS BIGINT) AS e
        FROM xv GROUP BY aud_id, kind, band),
      zc AS (
        SELECT a.aud_id, a.band, CAST(COUNT(*) AS BIGINT) AS z
        FROM xv a JOIN xv b
          ON a.aud_id = b.aud_id AND b.i = a.i + 1 AND b.band = a.band
        WHERE a.v * b.v < 0
        GROUP BY a.aud_id, a.band),
      bands AS (
        SELECT en.aud_id, en.kind, en.band, en.e,
               COALESCE(zc.z, 0) AS z
        FROM en LEFT JOIN zc
          ON zc.aud_id = en.aud_id AND zc.band = en.band),
      bits AS (
        SELECT a.aud_id, a.kind, a.band AS j,
               CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS ebit,
               CASE WHEN b.z > a.z THEN 1 ELSE 0 END AS zbit
        FROM bands a JOIN bands b
          ON a.aud_id = b.aud_id AND b.band = a.band + 1
        WHERE a.band < 31),
      hs AS (
        SELECT aud_id, kind,
               CAST(SUM(zbit * (1::BIGINT << j)) AS BIGINT) AS hash_hi,
               CAST(SUM(ebit * (1::BIGINT << j)) AS BIGINT) AS hash_lo
        FROM bits GROUP BY aud_id, kind),
      pairs AS (
        SELECT a.aud_id AS ai, b.aud_id AS bi
        FROM hs a JOIN hs b ON a.aud_id < b.aud_id
        WHERE bit_count(xor(a.hash_hi, b.hash_hi))
            + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
      nd AS (
        SELECT aud_id, COUNT(*) AS n_dup
        FROM (SELECT ai AS aud_id FROM pairs
              UNION ALL SELECT bi FROM pairs)
        GROUP BY aud_id),
      shadowed AS (SELECT DISTINCT bi AS aud_id FROM pairs)
      SELECT h.aud_id, h.kind, h.hash_hi, h.hash_lo,
             CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup,
             (shadowed.aud_id IS NULL) AS kept
      FROM hs h
      LEFT JOIN nd ON h.aud_id = nd.aud_id
      LEFT JOIN shadowed ON h.aud_id = shadowed.aud_id
      ORDER BY h.aud_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.audioNearDup(
        Multimodal.audioFingerprint(Multimodal.audioCorpus(documents(s, d))).toDF())
      .orderBy("aud_id")
  }

  // --- Y13: video keyframe near-dup — the third modality of the dedup
  // family (y08 images, y11 audio): real ISO-BMFF containers whose mdat
  // carries raw frame essence, planted REPACKED copies (identical frames
  // behind a shifted mdat offset — hash-identical iff the demux really
  // walks the boxes) and +9 brightness re-grades (a few gradient bits
  // per frame), dHash per sampled keyframe (the x33 ⌊j·n/k⌋ grid), and a
  // frame-level Hamming-banded join rolled up to a video verdict when
  // ≥ 2 of the 4 keyframes match. The oracle replays pixels (per-video
  // x-gradient 7 + src % 23 — the hash-diversity term), the sampling
  // grid (w = 18, h = 16 ⇒ the 9×8 NN downsample reads exactly (2x, 2y)),
  // bit packing, framewise Hamming ≤ 3 and the ≥ 2-frame rollup in
  // closed form.
  val y13 = Query(
    "y13_video_neardup",
    Some("""
      WITH sel AS (
        SELECT doc_id, 8 + doc_id % 24 AS n
        FROM documents WHERE doc_id % 5 = 0),
      vids AS (
        SELECT doc_id AS vid_id, 'orig' AS kind, doc_id AS src,
               0 AS shift, n FROM sel
        UNION ALL
        SELECT doc_id + 50000000, 'repack', doc_id, 0, n
        FROM sel WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 60000000, 'shifted', doc_id, 9, n
        FROM sel WHERE doc_id % 10 = 5),
      kf AS (
        SELECT vid_id, kind, src, shift, n,
               CAST(j AS INT) AS j, CAST(j * n // 4 AS INT) AS f
        FROM vids, (SELECT unnest(range(0, 4)) AS j)),
      xs AS (SELECT *, unnest(range(0, 9)) AS x FROM kf),
      g AS (SELECT *, unnest(range(0, 8)) AS y FROM xs),
      px AS (
        SELECT vid_id, kind, j, x, y,
               (src * 31 + f * 97 + 2 * (7 + src % 23) * x + 2 * y + shift) % 256 AS v
        FROM g),
      bits AS (
        SELECT a.vid_id, a.kind, a.j, a.x, a.y,
               CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        FROM px a JOIN px b
          ON a.vid_id = b.vid_id AND a.j = b.j
         AND b.x = a.x + 1 AND b.y = a.y
        WHERE a.x < 8),
      hs AS (
        SELECT vid_id, kind, j,
               CAST(SUM(CASE WHEN y >= 4
                 THEN bit * (1::BIGINT << ((y - 4) * 8 + x)) ELSE 0 END)
                 AS BIGINT) AS hash_hi,
               CAST(SUM(CASE WHEN y < 4
                 THEN bit * (1::BIGINT << (y * 8 + x)) ELSE 0 END)
                 AS BIGINT) AS hash_lo
        FROM bits GROUP BY vid_id, kind, j),
      fpairs AS (
        SELECT a.vid_id AS ai, b.vid_id AS bi, a.j
        FROM hs a JOIN hs b ON a.vid_id < b.vid_id AND a.j = b.j
        WHERE bit_count(xor(a.hash_hi, b.hash_hi))
            + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
      vpairs AS (
        SELECT ai, bi, COUNT(*) AS nf
        FROM fpairs GROUP BY ai, bi HAVING COUNT(*) >= 2),
      nd AS (
        SELECT vid_id, COUNT(*) AS n_dup
        FROM (SELECT ai AS vid_id FROM vpairs
              UNION ALL SELECT bi FROM vpairs)
        GROUP BY vid_id),
      shadowed AS (SELECT DISTINCT bi AS vid_id FROM vpairs)
      SELECT v.vid_id, v.kind, CAST(4 AS BIGINT) AS n_keyframes,
             CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup,
             (shadowed.vid_id IS NULL) AS kept
      FROM vids v
      LEFT JOIN nd ON v.vid_id = nd.vid_id
      LEFT JOIN shadowed ON v.vid_id = shadowed.vid_id
      ORDER BY v.vid_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.videoNearDup(
        Multimodal.videoKeyframeHashes(Multimodal.videoCorpus(documents(s, d)))
          .toDF())
      .orderBy("vid_id")
  }

  // --- X51: REAL audio codec — javax.sound.sampled WAV round-trip:
  // deterministic 16-bit mono PCM encoded into a real RIFF/WAVE
  // container, decoded back (signature + fmt chunk + frame fold); the
  // oracle states format, frame count and signed-sample sum in closed
  // form. With x44/x50 this leaves only video on the documented stub.
  val x51 = Query(
    "x51_multimodal_audio",
    Some("""
      WITH sel AS (
        SELECT doc_id, 64 + doc_id % 128 AS n
        FROM documents WHERE doc_id % 20 = 0),
      smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM sel)
      SELECT doc_id,
             CAST(8000 AS INT) AS sample_rate,
             CAST(1 AS INT) AS channels,
             CAST(n AS BIGINT) AS n_samples,
             CAST(SUM((doc_id * 7 + i * 13) % 2003 - 1001) AS BIGINT) AS sample_sum,
             CAST(1 AS INT) AS ok_riff
      FROM smp
      GROUP BY doc_id, n
      ORDER BY doc_id""")
  ) { (s, d) =>
    import graft.operators.Multimodal
    Multimodal.decodeWav(
        Multimodal.encodeWav(documents(s, d).filter(col("doc_id") % 20 === 0)))
      .toDF()
      .orderBy("doc_id")
  }

  // --- X11: as-of join — each purchase matched to the user's latest
  // strictly-prior click. Spark: last-ignoreNulls over a tagged union
  // (no native as-of operator); DuckDB oracle: native ASOF JOIN.
  val x11 = Query(
    "x11_asof_join",
    Some("""
      WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, event_id AS click_id
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase')
      SELECT purchase_id, p.user_id, click_id,
             date_diff('microsecond', cts, pts) AS gap_us
      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.pts > c.cts
      ORDER BY purchase_id""")
  ) { (s, d) =>
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    // Purchases sort BEFORE same-ts clicks so the preceding-rows frame
    // only ever sees strictly-prior clicks (matches the oracle's
    // `p.pts > c.cts`); fixture ts are unique per user, but the operator
    // must not depend on that.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"),
        when(col("event_type") === "purchase", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  // --- Y14: the SAME as-of semantics through the custom Catalyst
  // operator (AsOfJoinPlan → AsOfJoinExec, SURVEY §4 item 3): sorted
  // merge over two key-Exchanges — each side shuffles only its own
  // columns, no null-padded union row ever exists, and the merge holds
  // O(1) state instead of a window frame. Producing x11's exact rows
  // through a disjoint physical plan is the cross-check.
  val y14 = Query(
    "y14_asof_custom",
    Some("""
      WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, event_id AS click_id
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase')
      SELECT purchase_id, p.user_id, click_id,
             date_diff('microsecond', cts, pts) AS gap_us
      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.pts > c.cts
      ORDER BY purchase_id""")
  ) { (s, d) =>
    import graft.plans.AsOf
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    // Strict (`allowExact = false`) matches the oracle's `p.pts > c.cts`;
    // click_id tiebreak makes equal-ts candidates deterministic (the
    // fixture has unique per-user ts, but the operator must not rely on
    // that — x11's own caveat).
    AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts",
        rightTieBreak = Seq("click_id"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("ts_r"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  // --- Y15: tolerance-bounded LEFT OUTER as-of — every purchase keeps a
  // row; the click attaches only when it happened within 24 h. Tolerance
  // is monotone in the as-of candidate (the latest prior click has the
  // smallest gap), so the oracle can post-filter a plain ASOF LEFT JOIN;
  // the custom exec applies the bound inside the merge.
  val y15 = Query(
    "y15_asof_tolerance",
    Some("""
      WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, event_id AS click_id
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase'),
      j AS (SELECT purchase_id, p.user_id AS user_id, click_id,
                   date_diff('microsecond', cts, pts) AS gap_us
            FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.pts > c.cts)
      SELECT purchase_id, user_id,
             CASE WHEN gap_us <= 86400000000 THEN click_id END AS click_id,
             CASE WHEN gap_us <= 86400000000 THEN gap_us END AS gap_us
      FROM j ORDER BY purchase_id""")
  ) { (s, d) =>
    import graft.plans.AsOf
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts",
        toleranceUs = Some(86400000000L), outer = true,
        rightTieBreak = Seq("click_id"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("ts_r"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  // --- Y37: the SALTED as-of join under the oracle — y14's exact
  // answer reproduced through the skew-mitigated physical form: the
  // merge is re-keyed by (user, ⌊ts/7 days⌋) with each populated left
  // bucket's boundary winner carried in via a bucket-index as-of
  // (AsOf.joinSalted; the hot-key lever SCALE.md Round 9 measures at
  // 3.8×). Grading it against DuckDB's native ASOF JOIN pins that the
  // salt is invisible in the result — the x37/x52 discipline applied to
  // the custom exec. (The fixture has unique per-user ts, so the
  // salted form's arbitrary-tie behavior is not exercised — y14 keeps
  // the tiebreak variant graded.)
  val y37 = Query(
    "y37_asof_salted",
    Some("""
      WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, event_id AS click_id
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase')
      SELECT purchase_id, p.user_id, click_id,
             date_diff('microsecond', cts, pts) AS gap_us
      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.pts > c.cts
      ORDER BY purchase_id""")
  ) { (s, d) =>
    import graft.plans.AsOf
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    AsOf.joinSalted(purchases, clicks, Seq("user_id"), "ts", "ts",
        bucketUs = 604800000000L)
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("ts_r"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  // --- Y44: TIME-SERIES RESAMPLE + FORWARD FILL — the gap-filling
  // shape every metrics pipeline needs: each user's event series
  // resampled onto a daily grid, each grid point carrying the LAST
  // observed value at-or-before it (or NULL before the first event —
  // impossible here since the grid starts at the user's own first day).
  // The fill is exactly an as-of join (allowExact) from the generated
  // grid to the events — the custom AsOfJoinExec composed into a
  // realistic pipeline; the grid is a per-user sequence explode (≤ span
  // days rows, never a cross join with a calendar dim).
  private val DayUs = 86400000000L
  val y44 = Query(
    "y44_resample_ffill",
    Some(s"""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                        value, event_id
                 FROM events),
      span AS (SELECT user_id, min(tus) // $DayUs AS d_lo,
                      max(tus) // $DayUs AS d_hi
               FROM e GROUP BY user_id),
      grid AS (SELECT user_id, CAST(g.d AS BIGINT) AS day_idx,
                      CAST(g.d AS BIGINT) * $DayUs AS grid_us
               FROM span, LATERAL (SELECT UNNEST(range(d_lo, d_hi + 1)) AS d) g),
      f AS (SELECT grid.user_id, day_idx, e.value
            FROM grid ASOF LEFT JOIN e
              ON grid.user_id = e.user_id AND grid.grid_us >= e.tus)
      SELECT user_id, day_idx, ROUND(value, 6) AS value
      FROM f ORDER BY user_id, day_idx""")
  ) { (s, d) =>
    import graft.plans.AsOf
    val e = events(s, d).select(col("user_id"),
      unix_micros(col("ts")).as("tus"), col("value"), col("event_id"))
    val grid = e.groupBy("user_id")
      .agg(expr(s"min(tus) div ${DayUs}L").as("d_lo"),
        expr(s"max(tus) div ${DayUs}L").as("d_hi"))
      .select(col("user_id"),
        explode(sequence(col("d_lo"), col("d_hi"))).as("day_idx"))
      .withColumn("grid_us", col("day_idx") * lit(DayUs))
    AsOf.join(grid, e.select("user_id", "tus", "value", "event_id"),
        Seq("user_id"), "grid_us", "tus",
        allowExact = true, outer = true, rightTieBreak = Seq("event_id"))
      .select(col("user_id"), col("day_idx"),
        round(col("value"), 6).as("value"))
      .orderBy("user_id", "day_idx")
  }

  // --- Y16: interval overlap join — view windows (48 h) × click windows
  // (24 h) per user. The scale-safe shape for interval×interval (neither
  // side broadcastable at 100 TB, unlike x12's 4-row banded dim): each
  // interval explodes into the ≤3 coarse 24 h time buckets it covers, the
  // join is equi on (user_id, bucket), and each qualifying pair is kept
  // exactly ONCE via the canonical-bucket trick — the row survives only
  // in bucket max(⌊vlo/B⌋, ⌊clo/B⌋), the first bucket the two intervals
  // share — so no pair-dedup shuffle ever runs. Candidate volume is
  // Σ per-bucket |views|·|clicks| per user: bounded by the bucket width
  // (the skew lever), never |views|·|clicks| per user.
  val y16 = Query(
    "y16_interval_join",
    Some("""
      WITH v AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS vlo,
                        epoch_us(CAST(ts AS TIMESTAMP)) + 172800000000 AS vhi
                 FROM events WHERE event_type = 'view'),
      c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS clo,
                   epoch_us(CAST(ts AS TIMESTAMP)) + 86400000000 AS chi
            FROM events WHERE event_type = 'click'),
      p AS (SELECT v.user_id AS user_id,
                   least(vhi, chi) - greatest(vlo, clo) AS ov
            FROM v JOIN c ON v.user_id = c.user_id
                         AND vlo <= chi AND clo <= vhi)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(ov) AS BIGINT) AS overlap_us,
             CAST(MAX(ov) AS BIGINT) AS max_overlap_us
      FROM p GROUP BY user_id ORDER BY user_id""")
  ) { (s, d) =>
    val B = 86400000000L // 24 h bucket width, µs
    val ev = events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vlo"),
        (unix_micros(col("ts")) + lit(172800000000L)).as("vhi"))
      .withColumn("b", explode(sequence(floor(col("vlo") / B).cast("long"),
        floor(col("vhi") / B).cast("long"))))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("clo"),
        (unix_micros(col("ts")) + lit(86400000000L)).as("chi"))
      .withColumn("b", explode(sequence(floor(col("clo") / B).cast("long"),
        floor(col("chi") / B).cast("long"))))
    v.join(c, Seq("user_id", "b"))
      .filter(col("vlo") <= col("chi") && col("clo") <= col("vhi") &&
        col("b") === greatest(floor(col("vlo") / B).cast("long"),
          floor(col("clo") / B).cast("long")))
      .select(col("user_id"),
        (least(col("vhi"), col("chi")) - greatest(col("vlo"), col("clo"))).as("ov"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), sum("ov").as("overlap_us"),
        max("ov").as("max_overlap_us"))
      .orderBy("user_id")
  }

  // --- X12: range (theta) join against a banded dimension
  val x12 = Query(
    "x12_range_join",
    Some("""
      WITH bands(band, lo, hi) AS (
        VALUES ('low', 1, 9), ('mid', 10, 24), ('high', 25, 39), ('bulk', 40, 50))
      SELECT band,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity <= hi
      GROUP BY band
      ORDER BY band""")
  ) { (s, d) =>
    val spark = s
    import spark.implicits._
    val bands = Seq(("low", 1, 9), ("mid", 10, 24), ("high", 25, 39), ("bulk", 40, 50))
      .toDF("band", "lo", "hi")
    lineitem(s, d)
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy("band")
  }

  // --- X13: gap-based sessionization (30-min inactivity boundary)
  val x13 = Query(
    "x13_sessionize",
    Some("""
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      g AS (SELECT user_id, event_id, ts,
              CASE WHEN lag(ts) OVER w IS NULL
                     OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                   THEN 1 ELSE 0 END AS brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (SELECT user_id,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM g),
      per_session AS (
        SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_ev
        FROM s GROUP BY 1, 2)
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(n_ev) AS BIGINT) AS n_events,
             CAST(MAX(n_ev) AS BIGINT) AS max_session_events
      FROM per_session GROUP BY user_id
      ORDER BY user_id""")
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val brk = when(lag(col("ts"), 1).over(w).isNull
      || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
      .otherwise(0)
    val sessions = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("brk", brk)
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSession = sessions.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_ev"))
    perSession.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_ev").as("n_events"),
        max("n_ev").as("max_session_events"))
      .orderBy("user_id")
  }

  val all: Seq[Query] = Seq(x10, x11, x12, x13, x33, x44, x50, x51, x57, y08,
    y11, y13, y14, y15, y16, y37, y44)
}
