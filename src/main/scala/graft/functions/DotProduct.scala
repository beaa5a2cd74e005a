package graft.functions

import org.apache.spark.sql.{Column, Encoders, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the double-array dot product — the
  * hot scalar of every vector-similarity operator (q15/q34/q49 scoring,
  * norm computation).
  *
  * Why a custom Expression rather than `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`: the composed form allocates an intermediate ArrayData
  * per evaluation and walks two higher-order-function closures per
  * element; this expression is a single fused loop, and `doGenCode`
  * splices that loop directly into whole-stage codegen (no virtual
  * calls, no allocation). For EQUAL-LENGTH inputs — the only shape the
  * engine produces; every embedding column is fixed-dim — semantics
  * are IDENTICAL to the composed form: a strict sequential
  * left-to-right sum, the same evaluation order DuckDB's
  * list_dot_product uses, so every oracle hash is unchanged (asserted
  * by DotProductSpec at the bit level). On unequal lengths the two
  * forms diverge by construction: zip_with null-pads to the longer
  * array (the composed form returns NULL), while this expression
  * truncates to min(length) and returns the partial sum. Callers must
  * guarantee equal dims.
  *
  * This is the preference order the engine follows for extensions:
  * compose built-ins where they fuse well; drop to a native Expression
  * with codegen when the composition itself becomes the overhead; UDFs
  * never (they would break codegen and add serialization).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Column-API and SQL-surface access to the native expressions. */
object GraftFunctions {

  private[graft] val registration = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children.head, children(1)): Expression
    })

  private[graft] val simhashRegistration = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_simhash64 takes exactly 1 argument")
      SimHash64(children.head): Expression
    })

  /** Idempotently register the native expressions on a session (the
    * non-extensions path — library entry points call this on the
    * session they receive). Also registers the TopKPairs typed
    * Aggregator as the SQL aggregate `graft_topk5(token, n)` — the
    * third extension surface (Expression, UDAF, SessionExtensions)
    * reachable from plain SQL text. Entry points call this per query,
    * so a session that already has the functions is left untouched —
    * re-registering the UDAF would log a 'replaced a previously
    * registered function' WARN on every call. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(registration._1))
      reg.registerFunction(registration._1, registration._2, registration._3)
    if (!reg.functionExists(simhashRegistration._1))
      reg.registerFunction(simhashRegistration._1,
        simhashRegistration._2, simhashRegistration._3)
    if (!reg.functionExists(FunctionIdentifier("graft_topk5")))
      spark.udf.register("graft_topk5",
        org.apache.spark.sql.functions.udaf(new TopKPairs(5),
          Encoders.tuple(Encoders.STRING, Encoders.scalaLong)))
  }

  /** `graft_dot(a, b)` as a Column. Resolves through the function
    * registry, so `register(spark)` (or the extensions hook) must have
    * run on the owning session. */
  def dotProduct(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** `graft_simhash64(tokens)` as a Column (same registry contract). */
  def simHash64(tokens: Column): Column =
    call_function("graft_simhash64", tokens)
}

/** SparkSessionExtensions hook: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * spark.sql.extensions=graft.functions.GraftExtensions) get
  * `graft_dot` in SQL without an explicit register() call. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.registration)
    ext.injectFunction(GraftFunctions.simhashRegistration)
    // the DuckDB-dialect pack rides the same hook, so an
    // extensions-built session runs the oracle corpus verbatim too
    // (the two compat session confs — ANSI double-quoted identifiers,
    // recursion limit — are still DuckDbCompat.register's job, as
    // extensions cannot set confs)
    DuckDbCompat.registrations.foreach(ext.injectFunction)
  }
}
