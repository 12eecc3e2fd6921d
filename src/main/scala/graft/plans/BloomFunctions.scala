package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's own runtime-filter bloom expressions —
  * `BloomFilterAggregate` / `BloomFilterMightContain` are what
  * `InjectRuntimeFilter` plants automatically when its thresholds fire
  * (PlanSpec pins that eligibility), but they are internal-registry
  * only: a pipeline author cannot build an EXPLICIT semi-join
  * reduction with them. Registering the pair under graft names makes
  * the idiom available as a first-class operator (`q_bloom_join`):
  * build a bloom over the selective side's join keys, prune the
  * probe-side scan with `might_contain` BEFORE the exact join, and
  * let the join remove the bloom's false positives — same result,
  * probe-side exchange shrunk by the dim's selectivity.
  *
  * Both expressions take xxhash64'd keys (LongType): hashing once and
  * filtering on the long is the same discipline the built-in runtime
  * filter uses.
  */
object BloomFunctions {
  val AggName = "graft_bloom_agg"
  val MightContainName = "graft_might_contain"

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(AggName),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, AggName),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"$AggName(xxhash64_key, estimated_items, num_bits)")
        new BloomFilterAggregate(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier(MightContainName),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, MightContainName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$MightContainName(bloom, xxhash64_key)")
        BloomFilterMightContain(args(0), args(1))
      }))
  }
}
