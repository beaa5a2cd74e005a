package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy, Percentile}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-dialect compatibility pack: the reference oracle corpus
  * (`OracleSql` / `BoardOracleSql`) is written in the portable
  * DuckDB/ANSI subset, and this registry teaches the SAME bytes to
  * resolve on `spark.sql`. Every entry is a thin FunctionRegistry
  * builder that constructs a BUILT-IN Catalyst expression (or one of
  * graft's native codegen'd expressions) — no UDFs, no interpretation
  * tax: `unnest(xs)` plans exactly like `explode(xs)`,
  * `list_filter(xs, f)` exactly like `filter(xs, f)`, so whole-stage
  * codegen and all optimizer rules apply unchanged.
  *
  * Registered by `SqlSurface.registerViews`, i.e. wherever the SQL-text
  * surface is in play; DataFrame/Dataset entry points never need it.
  * `OracleSweepSpec` proves the corpus property: every non-excepted
  * oracle statement runs verbatim through `spark.sql` and matches its
  * DataFrame twin row-for-row.
  *
  * Two BUILTIN names are re-bound, both strictly widening DuckDB-isms
  * (Spark-dialect calls keep their exact builtin behavior):
  *  - `regexp_replace(s, p, r, 'g')`: DuckDB needs the 'g' flag for
  *    global replace; Spark is global by default and reads arg 4 as a
  *    POSITION. The builder drops a literal-'g' arg 4 and forwards any
  *    other arity/shape to the builtin expression.
  *  - `regexp_extract_all(s, p)`: DuckDB's 2-arg default extracts the
  *    FULL match (group 0); Spark's defaults to group 1 (an error for
  *    group-free patterns). The builder makes the 2-arg form group 0;
  *    explicit-index calls are untouched.
  */
object DuckDbCompat {

  /** DuckDB `len` is polymorphic (VARCHAR chars | list length) and
    * returns BIGINT; Spark splits this into `length`/`size`. One tiny
    * native expression dispatches on the input type at plan time, so
    * codegen stays branch-free per column. */
  case class PolyLen(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType | ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"len requires STRING or ARRAY input, got ${t.simpleString}")
    }
    override protected def nullSafeEval(v: Any): Any = child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].numChars().toLong
      case _: ArrayType => v.asInstanceOf[ArrayData].numElements().toLong
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      child.dataType match {
        case StringType => defineCodeGen(ctx, ev, c => s"(long) $c.numChars()")
        case _: ArrayType => defineCodeGen(ctx, ev, c => s"(long) $c.numElements()")
      }
    override protected def withNewChildInternal(c: Expression): PolyLen = copy(c)
  }

  private def lambda2(f: (Expression, Expression) => Expression): LambdaFunction = {
    val a = UnresolvedNamedLambdaVariable(Seq("acc"))
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    LambdaFunction(f(a, x), Seq(a, x))
  }
  private def lambda1(f: Expression => Expression): LambdaFunction = {
    val a = UnresolvedNamedLambdaVariable(Seq("acc"))
    LambdaFunction(f(a), Seq(a))
  }

  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** A typed EMPTY array matching `a`'s element type, without
    * evaluating anything beyond `a` itself. */
  private def emptyLike(a: Expression): Expression =
    Slice(CreateArray(Seq(a)), Literal(1), Literal(0))

  /** name -> builder over the already-parsed argument expressions. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // generators / series. DuckDB's generate_series returns the EMPTY
    // list when the stop lies behind the start for the step's sign;
    // Spark's sequence silently DESCENDS (2-arg) or throws (wrong-sign
    // step), so the builder pins DuckDB semantics once instead of
    // leaning on per-query WHERE guards. emptyLike builds a typed empty
    // array without evaluating the sequence. The step-sign test uses
    // step > step*0 so it types for both numeric and interval steps.
    "unnest" -> { case Seq(a) => Explode(a) },
    "generate_series" -> {
      case Seq(a, b) =>
        If(LessThan(b, a), emptyLike(a), Sequence(a, b, None))
      case Seq(a, b, s) =>
        val zero = Multiply(s, Literal(0))
        val empty = Or(
          And(GreaterThan(s, zero), LessThan(b, a)),
          And(LessThan(s, zero), GreaterThan(b, a)))
        If(empty, emptyLike(a), Sequence(a, b, Some(s)))
    },
    // list functions (DuckDB names over Spark's array expressions)
    "list_filter" -> { case Seq(a, f: LambdaFunction) => ArrayFilter(a, f) },
    "list_transform" -> { case Seq(a, f: LambdaFunction) => ArrayTransform(a, f) },
    // DuckDB's list_distinct element ORDER is unspecified (hash
    // order); Spark's array_distinct keeps first occurrence. Callers
    // needing a deterministic order must list_sort (the corpus does)
    "list_distinct" -> { case Seq(a) => ArrayDistinct(a) },
    // ArraySort's default comparator is ASC NULLS LAST — DuckDB's
    // list_sort default (SortArray would put NULLs FIRST)
    "list_sort" -> { case Seq(a) => new ArraySort(a) },
    "list_max" -> { case Seq(a) => ArrayMax(a) },
    "list_value" -> { xs => CreateArray(xs) },
    // DuckDB list_sum of an integral list is exact (HUGEINT); the
    // corpus only sums integral lists, folded here in BIGINT.
    // NULL semantics match DuckDB exactly: NULL elements are skipped,
    // and a list with no non-NULL elements (empty included) sums to
    // NULL, not 0 — stripping NULLs first makes both properties fall
    // out of one Size guard.
    "list_sum" -> { case Seq(a) =>
      val stripped = ArrayFilter(a, lambda1(x => IsNotNull(x)))
      val folded = ArrayAggregate(stripped, Literal(0L),
        lambda2((acc, x) => Add(acc, Cast(x, LongType))), lambda1(identity))
      If(EqualTo(Size(stripped), Literal(0)), Literal(null, LongType), folded)
    },
    // 1-based, inclusive-end slice -> Spark's (start, length) slice
    "list_slice" -> { case Seq(a, b, e) =>
      Slice(a, Cast(b, IntegerType),
        Cast(Add(Subtract(e, b), Literal(1)), IntegerType))
    },
    // 1-based element access in both dialects (negative = from the
    // end in both); Spark wants an INT ordinal. DuckDB yields NULL for
    // index 0 and out-of-bounds, so the ordinal-0 branch and
    // failOnError=false pin that (ANSI ElementAt would throw on both).
    "list_extract" -> { case Seq(a, i) =>
      val ord = Cast(i, IntegerType)
      If(EqualTo(ord, Literal(0)), Literal(null, NullType),
        new ElementAt(a, ord, None, false))
    },
    "array_to_string" -> { case Seq(a, sep) => ArrayJoin(a, sep, None) },
    "list_dot_product" -> { case Seq(a, b) =>
      DotProduct(asDoubleArray(a), asDoubleArray(b))
    },
    // strings: DuckDB string_split splits on a LITERAL separator;
    // Spark's split takes a Java regex, so the separator is \Q..\E-quoted
    "string_split" -> { case Seq(s, sep) =>
      StringSplit(s, Concat(Seq(Literal("\\Q"), sep, Literal("\\E"))), Literal(-1))
    },
    "len" -> { case Seq(a) => PolyLen(a) },
    // time: epoch() is DOUBLE seconds, epoch_us() BIGINT micros,
    // epoch_ms(BIGINT) the millis->TIMESTAMP constructor
    "epoch" -> { case Seq(t) =>
      Divide(Cast(UnixMicros(Cast(t, TimestampType)), DoubleType), Literal(1e6))
    },
    "epoch_us" -> { case Seq(t) => UnixMicros(Cast(t, TimestampType)) },
    "epoch_ms" -> { case Seq(ms) => MillisToTimestamp(ms) },
    "json_extract_string" -> { case Seq(j, p) => GetJsonObject(j, p) },
    // integer division: DuckDB divide(a, b) truncates like Spark's
    // div, and yields NULL on a zero divisor (ANSI IntegralDivide
    // would throw) — the guard short-circuits per row
    "divide" -> { case Seq(a, b) =>
      If(EqualTo(b, Literal(0)), Literal(null, NullType), IntegralDivide(a, b))
    },
    // aggregates
    "arg_min" -> { case Seq(v, o) => MinBy(v, o) },
    "arg_max" -> { case Seq(v, o) => MaxBy(v, o) },
    "quantile_cont" -> { case Seq(c, p) => new Percentile(c, p) },
    // widened builtins (see object scaladoc)
    "regexp_replace" -> {
      case Seq(s, p, r) => RegExpReplace(s, p, r)
      // DuckDB options string: only 'g' maps onto Spark semantics
      // (Spark replaces globally by default). Any OTHER options value
      // ('i', 'gi', 's'...) must fail at analysis — forwarding it as
      // Spark's integer POSITION argument would cast to NULL and
      // silently NULL the whole column.
      case Seq(s, p, r, Literal(g: UTF8String, StringType)) =>
        if (g.toString == "g") RegExpReplace(s, p, r)
        else throw new IllegalArgumentException(
          s"regexp_replace options '$g' has no Spark equivalent " +
            "(only 'g' is supported by the DuckDB compat pack)")
      case Seq(s, p, r, pos) => RegExpReplace(s, p, r, pos)
    },
    "regexp_extract_all" -> {
      case Seq(s, p) => RegExpExtractAll(s, p, Literal(0))
      case Seq(s, p, i) => RegExpExtractAll(s, p, i)
    }
  )

  /** The pack as (identifier, info, builder) rows — the shape both
    * `FunctionRegistry.registerFunction` and
    * `SparkSessionExtensions.injectFunction` consume (GraftExtensions
    * injects these so extensions-built sessions speak the dialect
    * without an explicit register() call). */
  private[graft] def registrations
    : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(getClass.getCanonicalName, name), b)
    }

  /** Marker name: its presence means this session is already set up. */
  private val marker = FunctionIdentifier("graft_duckdb_compat")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(marker)) {
      registrations.foreach { case (id, info, b) =>
        reg.registerFunction(id, info, b)
      }
      reg.registerFunction(marker,
        new ExpressionInfo(getClass.getCanonicalName, marker.funcName),
        _ => Literal(true))
    }
    // DuckDB treats "..." as identifiers (ANSI); Spark's default reads
    // them as string literals, which would silently select the literal
    // instead of the column (q85's "offset"). Session-scoped, like the
    // function pack. The recursion limit covers the board fixture's
    // copies series at sf0.1 (101 levels) with headroom.
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "512")
  }
}
