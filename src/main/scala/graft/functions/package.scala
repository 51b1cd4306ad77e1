package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Column-level API for graft's native expressions, mirroring
  * `org.apache.spark.sql.functions`. The expressions resolve through the
  * session FunctionRegistry, so the session must be built with
  * [[GraftExtensions]] — [[Sessions.builder]] does this.
  */
package object functions {

  // cast already propagates NULL — no explicit branch needed
  private def toBytes(c: Column): Column =
    c.cast("string").cast(BinaryType)

  /** BLAKE2b digest (`size` bytes, default 8 as in the reference demo,
    * `HackerNewsPipeline.java:42`) of any column (serialized as its
    * string form for non-binary inputs, matching the reference's
    * serde-then-hash order, `Blake2BJoinKeySchema.java:38-50`).
    */
  def blake2b(c: Column, size: Int = 8): Column =
    call_function("graft_blake2b", toBytes(c), lit(size))

  /** Kafka-default-partitioner partition id of a key column. */
  def kafka_partition(c: Column, numPartitions: Int): Column =
    call_function("graft_kafka_partition", toBytes(c), lit(numPartitions))

  /** Distinct k-word shingles of a token-array column (native, fast
    * equivalent of the transform/slice/concat_ws HOF chain).
    */
  def shingles(toks: Column, k: Int = 3): Column =
    call_function("graft_shingles", toks, lit(k))

  /** First 60 bits of md5 as a long — fused, codegen'd equivalent of
    * `conv(substring(md5(c),1,15),16,10)`.
    */
  def md5_long(c: Column): Column =
    call_function("graft_md5_long", toBytes(c))

  /** 16-bit tf-weighted SimHash of a token-array column — map-side, no
    * shuffle (fused equivalent of explode → tf groupBy → 16 bit-sums).
    */
  def simhash16(toks: Column): Column =
    call_function("graft_simhash16", toks)

  /** Flat covariance sufficient statistics of a quantized array<long>
    * column: n(n+1)/2 upper-triangle products then the n raw values —
    * one primitive-loop kernel feeding a single posexplode + groupBy
    * (fused, codegen'd equivalent of a nested-HOF struct explode).
    */
  def cov_pairs(xq: Column): Column =
    call_function("graft_cov_pairs", xq)

  /** 16-slot MinHash signature (array<long>) of a shingle-array column —
    * map-side, no shuffle; NULL for empty arrays.
    */
  def minhash_sig(shingles: Column): Column =
    call_function("graft_minhash_sig", shingles)

  /** Count of common elements of two array<string> columns — the fused
    * form of `size(array_intersect(a, b))` (no intersection array is
    * materialized).
    */
  def intersect_size(a: Column, b: Column): Column =
    call_function("graft_intersect_size", a, b)

  /** All `tables` random-hyperplane LSH signatures (array<long>) of an
    * array<double> embedding column in one native pass — map-side, no
    * shuffle; NULL for null-element vectors and any length != dim.
    */
  def hyperplane_sigs(v: Column, bits: Int, tables: Int, dim: Int): Column =
    call_function("graft_hyperplane_sigs", v, lit(bits), lit(tables), lit(dim))

  /** Distinct winnowing-selected fingerprint keys (array<long>, packed
    * `hash·2^20 + (2^20-1-pos)`) of a token-array column in one native
    * pass — map-side, no shuffle; NULL when no full window exists.
    */
  def winnow_keys(toks: Column, k: Int, w: Int): Column =
    call_function("graft_winnow_keys", toks, lit(k), lit(w))

  /** PQ encode (array<int> `[bucket?, code0, …]`) of an array<double>
    * embedding column in one native pass: optional coarse IVF bucket
    * (when `cents` is non-empty) + one codebook code per subspace —
    * map-side, no shuffle; NULL for short/null-element vectors. The
    * trained constants travel as foldable array literals.
    */
  def pq_encode(v: Column, cents: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Double]]], residual: Boolean = false): Column =
    call_function("graft_pq_encode", v, typedLit(cents), typedLit(cbs), lit(residual))

  /** Codegen'd cosine similarity of two vector columns (cast to
    * `array<double>` so arithmetic is double end-to-end).
    */
  def cosine_sim(a: Column, b: Column): Column =
    call_function("graft_cosine_sim",
      a.cast("array<double>"), b.cast("array<double>"))

  /** Avro binary serde pair (see [[AvroEncode]]/[[AvroDecode]]): raw
    * binary datum under a plan-time writer schema — spark-avro's wire
    * format from the BUNDLED spark-sql kernel, usable offline.
    */
  def avro_encode(value: Column, jsonSchema: String): Column =
    call_function("graft_avro_encode", value, lit(jsonSchema))

  def avro_decode(value: Column, jsonSchema: String): Column =
    call_function("graft_avro_decode", value, lit(jsonSchema))

  /** Declares (zero-cost, trusted) that an array column has no null
    * elements, so the vector kernels take their branch-free loops —
    * apply at load boundaries whose writer guarantees dense vectors.
    */
  def known_non_null_elements(c: Column): Column =
    call_function("graft_known_non_null_elements", c)

  /** Composite join key `[size:1][blake2b(fk):size][blake2b(pk):size]`
    * (left records) — layout from `schema/JoinKey.java:29-43`.
    */
  def join_key(fk: Column, pk: Column, size: Int = 8): Column =
    concat(lit(Array(size.toByte)), blake2b(fk, size), blake2b(pk, size))

  /** FK-only join key with zeroed left half (right records,
    * `JoinKey.java:55`, `Blake2BJoinKeySchema.java:32-37`).
    */
  def join_key_right(fk: Column, size: Int = 8): Column =
    concat(lit(Array(size.toByte)), blake2b(fk, size), lit(new Array[Byte](size)))

  /** FK prefix of a composite key — what the reference prefix-scans on a
    * right-side arrival (`JoinKey.java:94-99`).
    */
  def join_key_prefix(key: Column, size: Int = 8): Column =
    substring(key, 1, 1 + size)

  /** True when the key's left half is all zeros (a right-side record,
    * `JoinKey.java:84-92`).
    */
  def join_key_is_right(key: Column, size: Int = 8): Column =
    substring(key, 2 + size, size) === lit(new Array[Byte](size))

  /** The raw FK digest bytes (no length prefix) — what the reference's
    * partitioner hashes (`JoinKeyPartitioner.java:21` uses
    * `key.rightKeyDigest()`, not `getPrefix()`).
    */
  def join_key_fk_digest(key: Column, size: Int = 8): Column =
    substring(key, 2, size)
}
