package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema armor for the WHOLE driver testdata surface — the round-7
  * lesson (events.ts regenerated `timestamp[ns]` → `timestamp[us]`,
  * 13 queries dark at analysis time) generalized: every table's
  * columns are pinned to the TYPE FAMILIES the engine's readers
  * actually absorb. A regeneration inside a family (int32↔int64,
  * float↔double embeddings, any of the three timestamp encodings) is
  * handled by the readers and passes; a drift OUTSIDE the families
  * fails HERE first, with a message naming the table and column,
  * instead of surfacing as a cryptic analysis error deep inside
  * whichever query touches the column first. */
class TablesSpec extends SparkSessionSpec {

  private val IntLike: DataType => Boolean = {
    case _: LongType | _: IntegerType | _: ShortType => true
    case _ => false
  }
  private val DoubleLike: DataType => Boolean = {
    case _: DoubleType | _: FloatType => true
    case _ => false
  }
  private val StringLike: DataType => Boolean = {
    case _: StringType => true
    case _ => false
  }
  // the three physical encodings Events.withTsUs dispatches on —
  // ONLY events.ts has the long-decoding path, so LongType is legal
  // here and nowhere else in the time family
  private val TsLike: DataType => Boolean = {
    case _: TimestampType | _: TimestampNTZType | _: LongType => true
    case _ => false
  }
  // date-valued columns (o_orderdate, l_shipdate): no reader decodes
  // an int64 date, so a regenerated long column must FAIL here
  // instead of silently breaking every date-consuming query
  private val DateLike: DataType => Boolean = {
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }
  private val FloatVec: DataType => Boolean = {
    case ArrayType(et, _) => DoubleLike(et)
    case _ => false
  }

  private val expected: Map[String, Map[String, DataType => Boolean]] = Map(
    "region" -> Map("r_regionkey" -> IntLike, "r_name" -> StringLike),
    "nation" -> Map("n_nationkey" -> IntLike, "n_name" -> StringLike,
      "n_regionkey" -> IntLike),
    "customer" -> Map("c_custkey" -> IntLike, "c_name" -> StringLike,
      "c_nationkey" -> IntLike, "c_acctbal" -> DoubleLike,
      "c_mktsegment" -> StringLike),
    "supplier" -> Map("s_suppkey" -> IntLike, "s_name" -> StringLike,
      "s_nationkey" -> IntLike, "s_acctbal" -> DoubleLike),
    "part" -> Map("p_partkey" -> IntLike, "p_name" -> StringLike,
      "p_brand" -> StringLike, "p_type" -> StringLike,
      "p_size" -> IntLike, "p_retailprice" -> DoubleLike),
    "orders" -> Map("o_orderkey" -> IntLike, "o_custkey" -> IntLike,
      "o_orderstatus" -> StringLike, "o_totalprice" -> DoubleLike,
      "o_orderdate" -> DateLike, "o_orderpriority" -> StringLike),
    "lineitem" -> Map("l_orderkey" -> IntLike, "l_partkey" -> IntLike,
      "l_suppkey" -> IntLike, "l_linenumber" -> IntLike,
      "l_quantity" -> DoubleLike, "l_extendedprice" -> DoubleLike,
      "l_discount" -> DoubleLike, "l_tax" -> DoubleLike,
      "l_returnflag" -> StringLike, "l_linestatus" -> StringLike,
      "l_shipdate" -> DateLike),
    "events" -> Map("event_id" -> IntLike, "ts" -> TsLike,
      "user_id" -> IntLike, "event_type" -> StringLike,
      "value" -> DoubleLike, "props" -> StringLike),
    "documents" -> Map("doc_id" -> IntLike, "text" -> StringLike,
      "lang" -> StringLike, "source" -> StringLike,
      "n_chars" -> IntLike),
    "embeddings" -> Map("vec_id" -> IntLike, "embedding" -> FloatVec,
      "label" -> IntLike))

  for ((table, cols) <- expected.toSeq.sortBy(_._1))
    test(s"$table schema stays inside the absorbed type families") {
      val schema = Tables.t(spark, sf0001, table).schema
      val present = schema.fields.map(f => f.name -> f.dataType).toMap
      for ((name, ok) <- cols) {
        assert(present.contains(name),
          s"testdata drift: $table.$name MISSING (regenerated schema? " +
            s"present: ${present.keys.toSeq.sorted.mkString(", ")})")
        assert(ok(present(name)),
          s"testdata drift: $table.$name arrived as ${present(name)} — " +
            "outside the type families the readers absorb; extend the " +
            "reader (the Events.withTsUs pattern) before any query " +
            "touches it")
      }
    }
}
