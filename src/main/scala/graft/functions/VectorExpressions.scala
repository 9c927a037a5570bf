package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the dense-vector hot path.
  *
  * The declarative forms (`aggregate(zip_with(a,b,(x,y)->x*y),...)`) are
  * higher-order functions, which Spark evaluates interpreted — one boxed
  * lambda call per element. At dim 64 × millions of scored pairs that
  * lambda overhead dominates the whole query (measured on the dedup
  * suite). These expressions produce the SAME double values — sequential
  * left-to-right accumulation over per-element float→double casts — so the
  * DuckDB oracles are unaffected, but run as a tight primitive loop inside
  * whole-stage codegen.
  *
  * Both operands must be non-null-element arrays of float or double (the
  * engine's vector type, SURVEY.md §1.2); unequal lengths raise (the index
  * dimension is fixed upstream, reference `upsert/upsert.go:70` — a
  * mismatch is an invariant violation, not a scorable pair).
  */
object VectorExprUtil {
  def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float> or array<double>, got $other")
  }

  def isVectorType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Analysis-time check so `vec_dot(1, 2)` in SQL fails with a clear
    * message instead of a runtime ClassCastException. */
  def checkVectorInputs(name: String, types: DataType*): TypeCheckResult =
    if (types.forall(isVectorType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> or array<double> arguments, got " +
        types.map(_.simpleString).mkString(", "))

  /** The string twin of [[checkVectorInputs]]: the text kernels are
    * SQL-registered (GraftExtensions), so `md5_prefix48(42)` must fail
    * analysis with a clear message — not pass the default check and die
    * at runtime with a ClassCastException (interpreted) or a Janino
    * compile failure that silently disables codegen. */
  def checkStringInput(name: String, dt: DataType): TypeCheckResult =
    if (dt == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string argument, got ${dt.simpleString}")

  @inline def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def elementsNullable(types: DataType*): Boolean =
    types.exists { case ArrayType(_, n) => n; case _ => false }

  /** Unequal vector lengths are an upstream-invariant violation (the index
    * dimension is fixed) — fail loudly rather than silently truncate to a
    * plausible-looking wrong score. Returns the common length. */
  @inline def requireSameLength(name: String, a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$name: vector lengths differ (${a.numElements()} vs ${b.numElements()})")
    n
  }

  /** The codegen form of [[requireSameLength]] — emitted before the loop. */
  def genSameLengthCheck(name: String, a: String, b: String, n: String): String =
    s"""int $n = $a.numElements();
       |if ($n != $b.numElements()) throw new IllegalArgumentException(
       |  "$name: vector lengths differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
       |""".stripMargin
}

/** Σ aᵢ·bᵢ in double — the kernel of cosine/dot-product scoring
  * (reference metric config `upsert/upsert.go:27`). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  private lazy val leftIsFloat = VectorExprUtil.elemIsFloat(left.dataType)
  private lazy val rightIsFloat = VectorExprUtil.elemIsFloat(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorInputs(prettyName, left.dataType, right.dataType)

  // a null ELEMENT nulls the result (matching the declarative zip_with/
  // aggregate forms, which propagate element nulls); requires declaring
  // the expression nullable even when the array columns themselves are not
  private lazy val elemNullable =
    VectorExprUtil.elementsNullable(left.dataType, right.dataType)
  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = VectorExprUtil.requireSameLength(prettyName, a, b)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (elemNullable && (a.isNullAt(i) || b.isNullAt(i))) return null
      sum += VectorExprUtil.get(a, i, leftIsFloat) * VectorExprUtil.get(b, i, rightIsFloat)
      i += 1
    }
    sum
  }

  // Null-element checks are emitted ONLY for containsNull=true inputs:
  // the tight loop stays branch-free for the engine's own (non-null)
  // vectors, and — crucially — the `ev.isNull` assignment only appears
  // when the expression is nullable, because nullSafeCodeGen never
  // declares that variable otherwise (Janino compile failure → silent
  // interpreted fallback; caught in review by executing the generated code).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (leftIsFloat) "getFloat" else "getDouble"
    val lb = if (rightIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val lenCheck = VectorExprUtil.genSameLengthCheck(prettyName, a, b, n)
      if (elemNullable) {
        val anyNull = ctx.freshName("anyNull")
        s"""
           |$lenCheck
           |double $sum = 0.0;
           |boolean $anyNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
           |  $sum += (double) $a.$la($i) * (double) $b.$lb($i);
           |}
           |if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
         """.stripMargin
      } else {
        s"""
           |$lenCheck
           |double $sum = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $sum += (double) $a.$la($i) * (double) $b.$lb($i);
           |}
           |${ev.value} = $sum;
         """.stripMargin
      }
    })
  }

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** √(Σ aᵢ²) — materialized once per indexed vector by the index build
  * (KnnSearch.withNorm) so scoring is one DotProduct per pair. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  private lazy val isFloat = VectorExprUtil.elemIsFloat(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorInputs(prettyName, child.dataType)

  private lazy val elemNullable = VectorExprUtil.elementsNullable(child.dataType)
  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (elemNullable && a.isNullAt(i)) return null
      val x = VectorExprUtil.get(a, i, isFloat)
      sum += x * x
      i += 1
    }
    math.sqrt(sum)
  }

  // See DotProduct.doGenCode: null branch (and ev.isNull) only when nullable.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val x = ctx.freshName("x")
      if (elemNullable) {
        val anyNull = ctx.freshName("anyNull")
        s"""
           |int $n = $a.numElements();
           |double $sum = 0.0;
           |boolean $anyNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { $anyNull = true; break; }
           |  double $x = (double) $a.$getter($i);
           |  $sum += $x * $x;
           |}
           |if ($anyNull) { ${ev.isNull} = true; }
           |else { ${ev.value} = java.lang.Math.sqrt($sum); }
         """.stripMargin
      } else {
        s"""
           |int $n = $a.numElements();
           |double $sum = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.$getter($i);
           |  $sum += $x * $x;
           |}
           |${ev.value} = java.lang.Math.sqrt($sum);
         """.stripMargin
      }
    })
  }

  override def prettyName: String = "vec_l2norm"
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
}

/** √(Σ (aᵢ−bᵢ)²) — the euclidean alternative metric
  * (`upsert/upsert.go:27`). */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  private lazy val leftIsFloat = VectorExprUtil.elemIsFloat(left.dataType)
  private lazy val rightIsFloat = VectorExprUtil.elemIsFloat(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorInputs(prettyName, left.dataType, right.dataType)

  private lazy val elemNullable =
    VectorExprUtil.elementsNullable(left.dataType, right.dataType)
  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = VectorExprUtil.requireSameLength(prettyName, a, b)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (elemNullable && (a.isNullAt(i) || b.isNullAt(i))) return null
      val d = VectorExprUtil.get(a, i, leftIsFloat) - VectorExprUtil.get(b, i, rightIsFloat)
      sum += d * d
      i += 1
    }
    math.sqrt(sum)
  }

  // See DotProduct.doGenCode: null branch (and ev.isNull) only when nullable.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (leftIsFloat) "getFloat" else "getDouble"
    val lb = if (rightIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      val lenCheck = VectorExprUtil.genSameLengthCheck(prettyName, a, b, n)
      if (elemNullable) {
        val anyNull = ctx.freshName("anyNull")
        s"""
           |$lenCheck
           |double $sum = 0.0;
           |boolean $anyNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
           |  double $d = (double) $a.$la($i) - (double) $b.$lb($i);
           |  $sum += $d * $d;
           |}
           |if ($anyNull) { ${ev.isNull} = true; }
           |else { ${ev.value} = java.lang.Math.sqrt($sum); }
         """.stripMargin
      } else {
        s"""
           |$lenCheck
           |double $sum = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = (double) $a.$la($i) - (double) $b.$lb($i);
           |  $sum += $d * $d;
           |}
           |${ev.value} = java.lang.Math.sqrt($sum);
         """.stripMargin
      }
    })
  }

  override def prettyName: String = "vec_l2dist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Distance =
    copy(left = l, right = r)
}

/** Unit-normalize a vector in ONE pass over the data (norm, then scale) —
  * the declarative `transform(a, x -> x / l2norm(a))` re-evaluates the
  * norm subtree per element (O(dim²) per row, no common-subexpression
  * elimination inside lambdas). Zero vectors pass through as zeros
  * (0/0 would be NaN); a null element nulls the result.
  *
  * Codegen emits a static call into [[L2Normalize.compute]], keeping the
  * normalize projection inside whole-stage codegen. */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val isFloat = VectorExprUtil.elemIsFloat(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorInputs(prettyName, child.dataType)

  private lazy val elemNullable = VectorExprUtil.elementsNullable(child.dataType)
  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(v: Any): Any =
    L2Normalize.compute(v.asInstanceOf[ArrayData], isFloat)

  // The kernel returns null for a null ELEMENT; `ev.isNull` may only be
  // assigned when the expression is nullable (see DotProduct.doGenCode).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val call = s"graft.functions.L2Normalize.compute($a, $isFloat)"
      if (elemNullable)
        s"""
           |${ev.value} = $call;
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      else s"${ev.value} = $call;"
    })

  override def prettyName: String = "vec_l2normalize"
  override protected def withNewChildInternal(c: Expression): L2Normalize = copy(child = c)
}

object L2Normalize {
  /** Static kernel shared by interpreted eval and generated code. Returns
    * null iff the vector has a null element. */
  def compute(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val vals = new Array[Double](n)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = VectorExprUtil.get(a, i, isFloat)
      vals(i) = x
      sum += x * x
      i += 1
    }
    val inv = if (sum > 0.0) 1.0 / math.sqrt(sum) else 0.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = vals(i) * inv; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
