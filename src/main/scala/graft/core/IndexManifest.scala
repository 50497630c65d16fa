package graft.core

import org.apache.spark.sql.SparkSession

/** Persisted-index manifest: a tiny JSON sidecar (`manifest.json`) written
  * next to every index an operator persists (MinHash signature tables, IVF
  * centroids, LSH bucket tables) recording the parameters that are part of
  * the index CONTRACT — hash-family seed, band shape, K, schema version.
  *
  * Why: `append`/`search` only produce correct results when called with the
  * SAME family parameters the index was built with. Before the manifest the
  * contract lived in scaladoc only, so an append with a different seed
  * silently corrupted the index (new rows hashed into unrelated buckets —
  * no error, just missing pairs). Now every read/append path calls
  * [[verify]] and fails fast on any mismatch or on a missing manifest.
  *
  * Written through the Hadoop FS API (not java.nio) so index dirs can live
  * on HDFS/S3 on a real cluster, same as the parquet tables beside them.
  */
object IndexManifest {
  val FILE = "manifest.json"

  /** Bump when an index layout changes shape incompatibly. */
  val SCHEMA_VERSION = "1"

  private def fsPath(s: SparkSession, indexDir: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$FILE")
    (p, p.getFileSystem(s.sparkContext.hadoopConfiguration))
  }

  /** Write the manifest (overwrites — build owns the dir). Values are kept
    * as strings; callers stringify numbers so compare is exact. */
  def write(s: SparkSession, indexDir: String, fields: Map[String, String]): Unit = {
    val all = fields + ("schema_version" -> SCHEMA_VERSION)
    // The flat unescaped format below round-trips ONLY for quote-,
    // backslash- and control-free strings; reject anything else up front
    // rather than writing a manifest read() would silently mis-parse.
    all.foreach { case (k, v) =>
      Seq(k, v).foreach { str =>
        require(!str.exists(c => c == '"' || c == '\\' || c.isControl),
          s"IndexManifest field ${k}=${v} contains a quote/backslash/control " +
            "char — unsupported in the flat manifest format")
      }
    }
    val json = all.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    val (p, fs) = fsPath(s, indexDir)
    val out = fs.create(p, true)
    // Plain writer, not PrintWriter (round-12 review): PrintWriter
    // swallows IOExceptions into an unchecked error flag, so a failed
    // close-time flush (HDFS/S3 lease or quota error) would report a
    // successful build with a missing/truncated manifest — breaking the
    // "manifest presence certifies a complete build" invariant. Write
    // and close must propagate.
    val w = new java.io.OutputStreamWriter(
      out, java.nio.charset.StandardCharsets.UTF_8)
    // try-with-resources semantics, not try/finally (ADVICE r12): when
    // write throws, the finally-close on the same broken stream usually
    // throws too and would MASK the original write failure — the root
    // cause this writer exists to surface. Success path: close inside
    // the try so a close-time flush failure still propagates. Failure
    // path: best-effort close, suppressed onto the primary.
    try {
      w.write(json); w.write('\n')
      w.close()
    } catch {
      case primary: Throwable =>
        try w.close() catch {
          case closeErr: Throwable if closeErr ne primary =>
            primary.addSuppressed(closeErr)
        }
        throw primary
    }
  }

  /** Delete the manifest if present. Builders call this FIRST, before
    * overwriting any index table: manifest-last alone only certifies the
    * first build into a dir — a REBUILD that dies between table writes
    * would otherwise leave the previous build's manifest sitting next to
    * mixed old/new tables, and verify() (which compares parameters, not
    * data) would accept the wreck. Delete-first + write-last makes the
    * manifest's presence certify a complete build in every case. */
  def invalidate(s: SparkSession, indexDir: String): Unit = {
    val (p, fs) = fsPath(s, indexDir)
    // Hadoop delete reports failure by returning FALSE (permissions,
    // leases), not only by throwing — an ignored false would leave the
    // OLD manifest certifying whatever mix of tables the rebuild dies
    // between, the exact wreck delete-first exists to prevent (round-12
    // review). Re-check exists to tolerate a concurrent delete.
    if (fs.exists(p) && !fs.delete(p, false) && fs.exists(p))
      throw new java.io.IOException(
        s"IndexManifest.invalidate: could not delete $p — refusing to " +
          "start a rebuild under a stale manifest")
  }

  /** Read the manifest; empty map if absent (callers decide how to fail).
    * Throws on any content [[write]] could not have produced — a nested or
    * hand-edited manifest must fail loudly, not parse silently-wrong: this
    * file guards the build parameters of three index families, and a
    * lenient parse that "finds" some pairs inside unexpected structure
    * would let verify() accept a manifest whose real content it never saw. */
  def read(s: SparkSession, indexDir: String): Map[String, String] = {
    val (p, fs) = fsPath(s, indexDir)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(
        in, "UTF-8").mkString finally in.close()
      parseFlat(text)
    }
  }

  /** Strict parser for exactly the flat `{"k":"v",...}` shape [[write]]
    * emits (no nesting, no escapes, no non-string values, no whitespace
    * between tokens other than a trailing newline). Anything else throws. */
  private[graft] def parseFlat(text: String): Map[String, String] = {
    val t = text.trim
    var i = 0
    def fail(what: String): Nothing = throw new IllegalStateException(
      s"malformed index manifest ($what at offset $i): not the flat " +
        "string-map format IndexManifest.write produces — rebuild the index")
    def expect(c: Char): Unit = {
      if (i >= t.length || t(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val start = i
      while (i < t.length && t(i) != '"') {
        if (t(i) == '\\' || t(i).isControl) fail("escape or control char")
        i += 1
      }
      if (i >= t.length) fail("unterminated string")
      val s = t.substring(start, i)
      i += 1
      s
    }
    expect('{')
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    if (i < t.length && t(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        val k = str()
        expect(':')
        val v = str()
        if (out.contains(k)) fail(s"duplicate key '$k'")
        out += k -> v
        if (i < t.length && t(i) == ',') i += 1
        else { expect('}'); more = false }
      }
    }
    if (i != t.length) fail("trailing content")
    out.toMap
  }

  /** Fail-fast compatibility check: every expected (param, value) must match
    * the stored manifest exactly. Throws with the full mismatch list so the
    * caller sees seed-vs-seed, not just "incompatible". */
  def verify(s: SparkSession, indexDir: String,
      expected: Map[String, String], op: String): Unit = {
    val stored = read(s, indexDir)
    if (stored.isEmpty)
      throw new IllegalStateException(
        s"$op: no $FILE under $indexDir — not a graft index, or built by a " +
          "pre-manifest version; rebuild with buildIndex/fit")
    val want = expected + ("schema_version" -> SCHEMA_VERSION)
    val bad = want.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      stored.get(k) match {
        case Some(`v`) => None
        case Some(other) => Some(s"$k: index has '$other', caller passed '$v'")
        case None => Some(s"$k: missing from manifest, caller passed '$v'")
      }
    }
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"$op: incompatible index at $indexDir — ${bad.mkString("; ")}")
  }
}
