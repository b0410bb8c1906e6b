package graft.sources

import java.io.{File, FileInputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Arrow IPC (Feather v2) file source — the engine's `from_arrow`
 * (reference: `modin.pandas.io.from_arrow`,
 * modin/pandas/dataframe/dataframe.py:4623 interchange surface). The
 * reference ingests an in-memory `pyarrow.Table`; the JVM-side analog is
 * the Arrow IPC file, read with the arrow-vector runtime Spark already
 * ships. One task per file; each task streams the file's record batches
 * and emits rows — so a directory of IPC files parallelizes like any
 * other multi-file scan. Supported types: int32/int64, float32/float64,
 * utf8, bool — the interchange-protocol core.
 */
object ArrowIpc {

  private def toSparkType(f: Field): DataType = f.getType match {
    case t: ArrowType.Int if t.getBitWidth == 64 => LongType
    case _: ArrowType.Int => IntegerType
    case t: ArrowType.FloatingPoint =>
      if (t.getPrecision == FloatingPointPrecision.SINGLE) FloatType else DoubleType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case other => throw new UnsupportedOperationException(
      s"arrow type ${other} not supported by ArrowIpc (int/float/utf8/bool are)")
  }

  private def readSchema(path: String): StructType = {
    val alloc = new RootAllocator()
    val ch = new FileInputStream(path).getChannel
    val reader = new ArrowFileReader(ch, alloc)
    try {
      val fields = reader.getVectorSchemaRoot.getSchema.getFields
      StructType((0 until fields.size()).map { i =>
        val f = fields.get(i)
        StructField(f.getName, toSparkType(f), f.isNullable)
      })
    } finally { reader.close(); ch.close(); alloc.close() }
  }

  /** Read one Arrow IPC file or a directory of them. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = {
      val f = new File(path)
      if (f.isDirectory)
        f.listFiles().filter(_.isFile).map(_.getAbsolutePath).sorted.toSeq
      else Seq(path)
    }
    require(files.nonEmpty, s"no arrow files under $path")
    val schema = readSchema(files.head)
    val rdd = spark.sparkContext.parallelize(files, files.size).flatMap { p =>
      val alloc = new RootAllocator()
      val ch = new FileInputStream(p).getChannel
      val reader = new ArrowFileReader(ch, alloc)
      var closed = false
      def closeAll(): Unit = if (!closed) {
        closed = true; reader.close(); ch.close(); alloc.close()
      }
      // partial consumption (limit/take, task failure) must still release
      // the channel and the allocator's direct memory — exhaustion alone
      // is not guaranteed to be reached
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
      // stream one record batch at a time — only the current batch's rows
      // are materialized, so task memory is bounded by the batch size,
      // not the file size
      new Iterator[Row] {
        private val root = reader.getVectorSchemaRoot
        private var batch = ArrayBuffer.empty[Row]
        private var pos = 0
        private var open = true
        private def loadBatch(): Unit = {
          batch.clear(); pos = 0
          // loop past zero-row record batches (legal in IPC files) —
          // treating the first empty batch as EOF would silently drop
          // every batch after it
          var more = true
          while (batch.isEmpty && more) {
            more = reader.loadNextBatch()
            if (more) {
              val vectors = root.getFieldVectors
              var i = 0
              while (i < root.getRowCount) {
                val vals = new Array[Any](vectors.size())
                var j = 0
                while (j < vectors.size()) {
                  val v = vectors.get(j)
                  vals(j) =
                    if (v.isNull(i)) null
                    else v.getObject(i) match {
                      case t: org.apache.arrow.vector.util.Text => t.toString
                      case x => x
                    }
                  j += 1
                }
                batch += Row.fromSeq(vals.toIndexedSeq)
                i += 1
              }
            }
          }
          if (batch.isEmpty && open) { open = false; closeAll() }
        }
        override def hasNext: Boolean = {
          if (pos >= batch.length && open) loadBatch()
          pos < batch.length
        }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = batch(pos); pos += 1; r
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
