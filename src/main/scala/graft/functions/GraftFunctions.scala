package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registry for graft's custom Catalyst expressions — usable from both the
  * DataFrame API (`expr("rolling_hash(c)")`) and `spark.sql`. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotProductI64].getName, "dot_i64"),
      (children: Seq[Expression]) => DotProductI64(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (children: Seq[Expression]) => DotProductF64(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sqdist_f64"),
      new ExpressionInfo(classOf[SqDistF64].getName, "sqdist_f64"),
      (children: Seq[Expression]) => SqDistF64(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "minhash_signature(elementHash BIGINT, numPerms INT literal) takes exactly 2 arguments")
        require(children(1).foldable,
          "minhash_signature: numPerms must be a literal")
        MinHashSignature(
          children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "bloom_agg(keyHash BIGINT, numBits INT literal, numHashes INT literal) takes exactly 3 arguments")
        require(children(1).foldable && children(2).foldable,
          "bloom_agg: numBits and numHashes must be literals")
        BloomFilterAgg(
          children.head,
          children(1).eval().asInstanceOf[Number].intValue(),
          children(2).eval().asInstanceOf[Number].intValue())
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vector_sum"),
      new ExpressionInfo(classOf[VectorSumAgg].getName, "vector_sum"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "vector_sum(v ARRAY<DOUBLE>, dim INT literal) takes exactly 2 arguments")
        require(children(1).foldable, "vector_sum: dim must be a literal")
        VectorSumAgg(
          children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[FreqItemsSketch].getName, "freq_items"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "freq_items(item STRING, capacity INT literal) takes exactly 2 arguments")
        require(children(1).foldable, "freq_items: capacity must be a literal")
        FreqItemsSketch(
          children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("shingle_array"),
      new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "shingle_array(w ARRAY<STRING>, n INT literal) takes exactly 2 arguments")
        require(children(1).foldable, "shingle_array: n must be a literal")
        ShingleArray(
          children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      })
  }
}
