package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "pack documents into fixed-size context
  * windows" step every LLM training pipeline runs between curation and
  * tokenized-shard writing (the T5/GPT-NeoX "example packing" recipe:
  * concatenate documents until the context length is full, start a new
  * sequence on overflow).
  *
  * Global greedy packing is inherently sequential (each bin decision
  * depends on the running remainder), so the scalable shape is SHARDED
  * next-fit: partition the corpus into bounded shards (id DIV shardSize —
  * cells bounded by construction, the repo's bounded-cell contract),
  * pack within each shard in id order, and key bins by (shard, bin).
  * That is exactly what production packers do at 100 TB — packing is
  * embarrassingly parallel across worker-sized shards and the ≤ (1 doc
  * per shard) extra padding loss at shard boundaries is noise for any
  * shardSize ≫ docs-per-bin. One shuffle (groupBy shard); the per-shard
  * fold is a single codegen'd `aggregate` over a sorted ≤ shardSize-
  * element array — no window over the whole corpus, no driver collect,
  * no global coordination.
  */
object Packing {

  /** Next-fit packing of `(idCol, tokCol)` rows into bins of `capacity`
    * tokens within `shardSize`-row shards: returns
    * (shard, idCol, tokCol, bin) where `bin` restarts per shard and ids
    * are packed in ascending order. A document longer than `capacity`
    * gets a bin of its own (next-fit never splits a document — the
    * oversized ones are what a length filter upstream should have cut).
    * All-integer, so a SQL oracle reproduces it bit-for-bit. */
  def packNextFit(df: DataFrame, idCol: String, tokCol: String,
      capacity: Long, shardSize: Long): DataFrame = {
    require(capacity > 0 && shardSize > 0)
    val packed: Column = expr(
      s"""aggregate(
         |  docs,
         |  named_struct(
         |    'bin', cast(0 as bigint), 'run', cast(0 as bigint),
         |    'out', cast(array() as array<struct<id:bigint,tok:bigint,bin:bigint>>)),
         |  (acc, d) -> if(acc.run > 0 and acc.run + d.tok > ${capacity}L,
         |    named_struct('bin', acc.bin + 1L, 'run', d.tok,
         |      'out', array_append(acc.out,
         |        named_struct('id', d.id, 'tok', d.tok, 'bin', acc.bin + 1L))),
         |    named_struct('bin', acc.bin, 'run', acc.run + d.tok,
         |      'out', array_append(acc.out,
         |        named_struct('id', d.id, 'tok', d.tok, 'bin', acc.bin)))),
         |  acc -> acc.out)""".stripMargin)
    df.select(
        expr(s"cast($idCol as bigint) div ${shardSize}L").as("shard"),
        struct(col(idCol).cast("long").as("id"),
          col(tokCol).cast("long").as("tok")).as("d"))
      .groupBy("shard")
      // sort_array orders by the struct's first field (id) — the
      // deterministic in-shard packing order
      .agg(sort_array(collect_list(col("d"))).as("docs"))
      .select(col("shard"), explode(packed).as("p"))
      .select(col("shard"), col("p.id").as(idCol), col("p.tok").as(tokCol),
        col("p.bin").as("bin"))
  }
}
