package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's keyed-object catalog
  * files ({isin: {field: value, ...}, ...} — crocus
  * base_scraper.py:165-178): `spark.read.format("graft.sources.ProductsSource")
  * .load(path)` yields one row per ISIN with inferred string columns.
  *
  * A catalog file is driver-small by definition (one provider's product
  * list), so the scan plans a single partition; the value of the
  * connector is schema inference + first-class integration (catalog
  * files join/union like any other table, predicate pushdown upstream
  * of them is unaffected).
  */
class ProductsSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProductsSource.schemaOf(options.get("path"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ProductsTable(schema, properties.get("path"))
}

object ProductsSource {
  private val mapper = new ObjectMapper

  private[sources] def entries(path: String): Seq[(String, Map[String, String])] = {
    val root = mapper.readTree(new java.io.File(path))
    root.properties().asScala.toSeq.map { e =>
      val rec = e.getValue.properties().asScala.map { f =>
        f.getKey -> (if (f.getValue.isNull) null else f.getValue.asText())
      }.toMap
      e.getKey -> rec
    }
  }

  def schemaOf(path: String): StructType = {
    val fields = entries(path).flatMap(_._2.keys).distinct.sorted
    StructType(StructField("isin", StringType, nullable = false) +:
      fields.map(f => StructField(f, StringType, nullable = true)))
  }
}

class ProductsTable(schema0: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"products($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ProductsScanBuilder(schema0, path)
}

/** Column pruning + ISIN-equality filter pushdown: the record parse
  * only materializes requested fields, and `isin = 'X'` predicates are
  * applied at the source (the DSv2 analog of the reference's per-key
  * point lookup, crocus ishares.py:97-137). */
class ProductsScanBuilder(full: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In}

  private var required: StructType = full
  private var isinFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(full.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("isin", _: String) => true
      case In("isin", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = accepted
    // A pushed Filter array is a conjunction (AND), so multiple accepted
    // isin predicates must INTERSECT their value sets — unioning them
    // would leak rows that violate `isin = 'A' AND isin IN ('B','C')`.
    isinFilter = accepted.toSeq.map {
      case EqualTo(_, v: String) => Set(v)
      case In(_, vs) => vs.map(_.asInstanceOf[String]).toSet
      case _ => Set.empty[String]
    }.reduceOption(_ intersect _)
    rest // non-isin predicates stay in the Spark plan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ProductsScan(required, path, isinFilter)
}

class ProductsScan(schema0: StructType, path: String,
    isinFilter: Option[Set[String]]) extends Scan with Batch {
  override def description(): String =
    s"ProductsScan($path, pushedIsin=${isinFilter.getOrElse("*")})"
  override def readSchema(): StructType = schema0
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(ProductsPartition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new ProductsReaderFactory(schema0, isinFilter)
}

case class ProductsPartition(path: String) extends InputPartition

class ProductsReaderFactory(schema0: StructType,
    isinFilter: Option[Set[String]]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[ProductsPartition].path
    val it = ProductsSource.entries(path).iterator
      .filter { case (isin, _) => isinFilter.forall(_.contains(isin)) }
    val cols = schema0.fieldNames
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (isin, rec) = it.next()
          current = new GenericInternalRow(cols.map {
            case "isin" => UTF8String.fromString(isin)
            case f => rec.get(f).flatMap(Option(_))
              .map(UTF8String.fromString).orNull
          }.toArray[Any])
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
