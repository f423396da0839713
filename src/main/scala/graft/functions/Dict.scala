package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse external dictionaries (`dictGet('dim', 'attr', key)`):
  * a small keyed attribute table loaded into an in-memory hash map and
  * consulted per row with no join in the plan.
  *
  * This mirrors ClickHouse's own execution model — dictionaries are
  * node-local hash tables, refreshed out of band, NOT joined relations
  * — which is why the lookup is an expression rather than a plan
  * rewrite. The registry enforces the contract that makes that safe:
  * dictionaries are config-sized (bounded rows at registration, loud
  * error past the cap), so materializing one is O(dictionary), never
  * O(corpus). The resolved [[DictGet]] expression CAPTURES its hash
  * map, so on a cluster the table ships to executors inside the
  * serialized task like any broadcast-sized closure value; the
  * driver-side registry is consulted only during analysis.
  */
object Dict {

  /** Hard cap on dictionary size — a dictionary is configuration, not
    * data; past this you want a broadcast join, and the loud error
    * says so. */
  val MaxRows = 1000000

  private[functions] final case class Entry(valueType: DataType, table: Map[Any, Any])

  private val dicts =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Entry]()

  /** Load `df`'s (keyCol → attrCols) into the registry under `name`.
    * Keys normalize (integral widths, UTF8String) and values are stored
    * in Catalyst form so lookups are plain map hits. */
  def register(name: String, df: DataFrame, keyCol: String, attrCols: Seq[String]): Unit = {
    val rows = df.select((keyCol +: attrCols).map(org.apache.spark.sql.functions.col): _*)
      .limit(MaxRows + 1).collect()
    if (rows.length > MaxRows)
      throw new IllegalArgumentException(
        s"dictionary '$name' exceeds $MaxRows rows — use a broadcast join for data-sized tables")
    val schema = df.select(attrCols.map(org.apache.spark.sql.functions.col): _*).schema
    attrCols.zipWithIndex.foreach { case (attr, i) =>
      val m = rows.iterator
        .filter(r => !r.isNullAt(0))
        .map(r => norm(r.get(0)) -> toCatalyst(r.get(i + 1)))
        .toMap
      dicts.put((name, attr), Entry(schema.fields(i).dataType, m))
    }
  }

  def drop(name: String): Unit = {
    import scala.jdk.CollectionConverters._
    dicts.keySet().asScala.filter(_._1 == name).toList.foreach(dicts.remove)
  }

  /** Key normalization shared by registration and lookup. */
  def norm(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case other => other
  }

  private def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case d: java.sql.Date =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
    case t: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case other => other
  }

  private[functions] def entry(name: String, attr: String): Entry = {
    val e = dicts.get((name, attr))
    if (e == null) throw new IllegalArgumentException(
      s"unknown dictionary attribute '$name'.'$attr' — Dict.register it first")
    e
  }

  /** Static lookup helper for generated code. */
  def lookupIn(table: Map[Any, Any], key: Any): Any =
    table.get(norm(key)).orNull
}

/** The `dictGet` expression: dictionary and attribute must be string
  * literals (as in ClickHouse), the key is any expression. Null key or
  * missing entry → null (ClickHouse `dictGetOrNull` semantics). The
  * hash table is a constructor field, so it serializes with the plan. */
case class DictGet(
    dictName: String,
    attr: String,
    child: Expression,
    table: Map[Any, Any],
    valueType: DataType) extends UnaryExpression {

  override def dataType: DataType = valueType
  override def nullable: Boolean = true
  override def sql: String = s"dictGet('$dictName', '$attr', ${child.sql})"

  override def nullSafeEval(key: Any): Any = Dict.lookupIn(table, key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("dictTable", table, "scala.collection.immutable.Map")
    val res = ctx.freshName("dictRes")
    nullSafeCodeGen(ctx, ev, k => {
      s"""
         |Object $res = graft.functions.Dict.lookupIn($tbl, $k);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DictGet =
    copy(child = newChild)
}

object DictGet {
  /** Builder for the SQL registration: `dictGet('name', 'attr', key)`.
    * Resolves the dictionary at analysis time and captures its table. */
  def fromArgs(es: Seq[Expression]): Expression = (es(0), es(1)) match {
    case (Literal(n: UTF8String, _), Literal(a: UTF8String, _)) =>
      val e = Dict.entry(n.toString, a.toString)
      DictGet(n.toString, a.toString, es(2), e.table, e.valueType)
    case _ => throw new IllegalArgumentException(
      "dictGet(name, attr, key): name and attr must be string literals")
  }
}
