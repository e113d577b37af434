package graft
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import streaming.{StreamDoc, Streams}
object ScratchDbg {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("DBG_SF", "/root/testdata/sf0.01")
    val docs = dedup.Dedup.augmented(Sources.documents(spark, sfDir))
    val isBatch = col("doc_id") % 10 === 0
    val existing = docs.filter(!isBatch)
    val batchDocs = docs.filter(isBatch).select(col("doc_id"), col("text")).collect()
      .map(r => StreamDoc(r.getLong(0), new Timestamp(0L), r.getString(1))).sortBy(_.doc_id)
    val (mb1, mb2) = batchDocs.partition(d => (d.doc_id / 10) % 2 == 0)
    val base = "graft_dbg_ndbkt3"
    Seq("shingles","bands","dict","shids").foreach(p => EntryOps.dropManagedTable(spark, s"${base}_$p"))
    dedup.Dedup.writeLshIndexBucketed(existing, "doc_id", "text", base)
    val stream = MemoryStream[StreamDoc]
    val q = Streams.nearDupIngestBucketed(stream.toDF(), base, 0.6, appendToIndex = true)(_ => ())
    try {
      stream.addData(mb1.toIndexedSeq: _*); q.processAllAvailable()
      stream.addData(mb2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val shids = spark.table(s"${base}_shids").groupBy("id").agg(count(lit(1)).as("nh"))
    val shing = spark.table(s"${base}_shingles").groupBy("id").agg(count(lit(1)).as("ns"))
    val diff = shids.join(shing, Seq("id"), "full_outer")
      .filter(coalesce(col("nh"),lit(0L)) =!= coalesce(col("ns"),lit(0L)))
    println("NDIFF=" + diff.count())
    diff.orderBy("id").show(10)
    // check a diff id's shids rows for duplicate sids
    val ids = diff.select("id").limit(2).collect().map(_.getLong(0))
    if (ids.nonEmpty) {
      val x = spark.table(s"${base}_shids").filter(col("id").isin(ids.toSeq: _*))
        .groupBy("id","sid").agg(count(lit(1)).as("c")).filter(col("c")>1)
      println("DUP_SID_ROWS=" + x.count())
      // is the duplication exact-row duplication (same sid twice)?
    }
    Seq("shingles","bands","dict","shids").foreach(p => EntryOps.dropManagedTable(spark, s"${base}_$p"))
    spark.stop()
  }
}
