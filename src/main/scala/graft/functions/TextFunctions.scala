package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** Text-analysis / dedup / vector primitives for large-scale training-data
  * pipelines, defined as Spark SQL UDF macros (CREATE TEMPORARY FUNCTION …
  * RETURN …). SQL UDFs are macro-expanded into the Catalyst plan at analysis
  * time, so everything below stays inside whole-stage codegen — no opaque
  * Scala closures, no Encoder round-trips, no shuffle.
  *
  * Portability contract: `graft_hash` is the first 8 hex chars of md5 parsed
  * as a BIGINT — computable identically in DuckDB
  * (`('0x' || substr(md5(s),1,8))::BIGINT`), which is what makes the minhash/
  * simhash pipelines oracle-checkable without sharing code.
  *
  * Scale notes (100 TB): all functions are per-row (embarrassingly
  * parallel). The LSH join in SparkEntry `t07` shuffles on (band, bucket) —
  * the standard minhash-LSH candidate-generation topology; the ANN bucket
  * join in `e02` shuffles on the sign-bucket id instead of cross-joining.
  */
object TextFunctions {

  private val defs = Seq(
    // 32-bit-in-long portable hash
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_hash(s STRING) RETURNS BIGINT
       RETURN CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)""",

    // whitespace tokens
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_tokens(s STRING) RETURNS ARRAY<STRING>
       RETURN split(trim(s), '\\s+')""",

    // character n-grams (shingles). Deliberately NOT deduplicated: every
    // consumer (jaccard via array_intersect/array_union, minhash via
    // array_min) is duplicate-insensitive, and array_distinct is O(n²)
    // interpreted — it dominated the profile at 250 shingles/doc.
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_ngrams(s STRING, n INT) RETURNS ARRAY<STRING>
       RETURN CASE WHEN length(s) >= n
         THEN transform(sequence(1, length(s) - n + 1), i -> substring(s, i, n))
         ELSE array() END""",

    // word k-shingles — the document-dedup shingling unit. Char n-grams of
    // a small shared vocabulary make *unrelated* docs look similar (LSH
    // candidate blow-up); word shingles keep collision probability tied to
    // actual text reuse.
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_shingles(s STRING, k INT) RETURNS ARRAY<STRING>
       RETURN CASE WHEN size(graft_tokens(s)) >= k
         THEN transform(sequence(1, size(graft_tokens(s)) - k + 1),
                i -> concat_ws(' ', slice(graft_tokens(s), i, k)))
         ELSE array() END""",

    // n-gram Jaccard similarity (inputs assumed distinct arrays)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_jaccard(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE
       RETURN CASE WHEN size(array_union(a, b)) = 0 THEN 0.0D
         ELSE size(array_intersect(a, b)) / size(array_union(a, b)) END""",

    // minhash signature: h min-hashes over n-char shingles via ONE md5 per
    // shingle + per-seed affine permutations (a_k·x + b_k) mod P — the
    // universal-hashing family. P = 4294967311 (first prime > 2^32);
    // a_k < 2^24 keeps a_k·x < 2^56, so 64-bit arithmetic is exact and the
    // DuckDB oracle reproduces it bit-for-bit. The seeded-md5 formulation
    // costs h md5 calls per shingle — 16× the hashing on the hot path.
    // NOTE: hashes are inlined rather than calling graft_hash — a SQL UDF
    // call whose argument references an enclosing lambda variable fails
    // resolution (the macro expansion drops the lambda binding).
    // Single pass: fold the once-hashed shingle array, keeping h running
    // minimums (init = P, an upper bound for any (a·x+b) mod P).
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_minhash(s STRING, n INT, h INT) RETURNS ARRAY<BIGINT>
       RETURN aggregate(
         transform(graft_ngrams(s, n),
           g -> CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)),
         array_repeat(CAST(4294967311 AS BIGINT), h),
         (acc, x) -> zip_with(acc, sequence(0, h - 1),
           (m, k) -> least(m, ((CAST(k + 1 AS BIGINT) * 1000003 % 16777216) * x + k * 30011 + 1) % 4294967311)))""",

    // 32-bit simhash over whitespace tokens — single pass: one md5 per
    // token, folding a 32-counter array (the naive per-bit formulation
    // recomputes every token hash 32×).
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_simhash(s STRING) RETURNS BIGINT
       RETURN aggregate(
         transform(graft_tokens(s),
           t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)),
         array_repeat(CAST(0 AS BIGINT), 32),
         (acc, hh) -> zip_with(acc, sequence(0, 31),
           (a, b) -> a + CASE WHEN (shiftright(hh, CAST(b AS INT)) & 1) = 1 THEN 1 ELSE -1 END),
         acc -> aggregate(zip_with(acc, sequence(0, 31),
                  (a, b) -> CASE WHEN a > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))
                                 ELSE CAST(0 AS BIGINT) END),
                CAST(0 AS BIGINT), (x, y) -> x + y))""",

    // token count
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_token_count(s STRING) RETURNS INT
       RETURN size(graft_tokens(s))""",

    // stopword ratio over a fixed english stop set
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_stop_ratio(s STRING) RETURNS DOUBLE
       RETURN size(filter(graft_tokens(s), t -> t IN ('the','a','of','and','in','to','is')))
              / greatest(size(graft_tokens(s)), 1)""",

    // composite quality score in [0,1]
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_quality(s STRING) RETURNS DOUBLE
       RETURN 0.3 * graft_stop_ratio(s)
            + 0.4 * least(1.0D, size(graft_tokens(s)) / 100.0D)
            + 0.3 * (1.0D - least(1.0D, regexp_count(s, '[.,!?;]') / CAST(greatest(size(graft_tokens(s)), 1) AS DOUBLE)))""",

    // rolling-hash document fingerprint (first 64 tokens)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_fingerprint(s STRING) RETURNS BIGINT
       RETURN aggregate(slice(graft_tokens(s), 1, 64), CAST(7 AS BIGINT),
         (acc, t) -> (acc * 31 + CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)) % 1000000007)""",

  )

  // Vector kernels are StaticInvoke statics (graft.core.VecOps), not SQL
  // macros: the lambda-HOF formulation boxed every element and its generated
  // code dominated per-query janino compile time. Same left-fold FP
  // semantics, so the DuckDB oracles are unchanged.
  private val vecSigs: Seq[(String, String, DataType, Seq[DataType])] = Seq(
    ("graft_vec", "toDouble", ArrayType(DoubleType, containsNull = false), Seq(ArrayType(FloatType))),
    ("graft_dot", "dot", DoubleType, Seq(ArrayType(DoubleType), ArrayType(DoubleType))),
    ("graft_cosine", "cosine", DoubleType, Seq(ArrayType(DoubleType), ArrayType(DoubleType))),
    ("graft_bucket8", "bucket8", LongType, Seq(ArrayType(DoubleType))),
  )

  def register(spark: SparkSession): Unit = {
    defs.foreach(spark.sql(_))
    val vecOps = Class.forName("graft.core.VecOps")
    vecSigs.foreach { case (name, method, ret, params) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
        args => StaticInvoke(vecOps, ret, method,
          args.zip(params).map { case (e, t) => Cast(e, t) }, Nil,
          propagateNull = true, returnNullable = false),
        "scala_udf")
    }
  }
}
