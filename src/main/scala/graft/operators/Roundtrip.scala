package graft.operators

import org.apache.spark.sql.DataFrame

/** Encode -> decode helper used by the correctness queries: pushes a
  * DataFrame through the full distributed chunk pipeline (salted
  * repartition, per-partition codec, chunk blobs, record re-assembly) and
  * returns rows with the original schema. Any codec bug surfaces as a
  * value mismatch against the SQL oracle run on the raw table. */
object Roundtrip {
  def through(df: DataFrame, sortKeys: Seq[String] = Seq.empty,
      forced: Map[String, Int] = Map.empty, parts: Int = 8,
      blockCodec: Int = graft.core.BlockCodec.None): DataFrame = {
    val chunks = EncodeJob.encode(df, parts, partitionKeys = Seq.empty,
      sortKeys = sortKeys, saltBuckets = 64, forcedCodecs = forced,
      blockCodec = blockCodec)
    DecodeJob.decode(chunks, df.schema)
  }
}
