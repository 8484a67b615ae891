package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `registrable_domain(host)`: the Public-Suffix-List fold of a host (or
  * host:port) string — see [[graft.ops.PublicSuffixList]] for the
  * embedded rule snapshot and algorithm. Null in → null out; anything
  * that is not a plausible two-plus-label hostname quarantines to ''
  * (never a throw — the caller convention shared with the old two-label
  * regex fold this replaces).
  *
  * A native expression rather than a UDF or a regex chain: the fold is
  * a short label walk over three hash sets — one JVM call per row,
  * inlined into the consuming codegen stage, cheaper than the previous
  * three-regex chain and immune to the regex-engine-dialect drift class
  * (the oracle replays the rule sets as data, not the code).
  */
case class RegistrableDomainExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "registrable_domain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"registrable_domain requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(h: Any): Any =
    graft.ops.PublicSuffixList.fold(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      // static MODULE$ access, not addReferenceObj: the rule sets are
      // process-wide constants compiled into the jar — serializing the
      // object into every plan would be waste (and the object is not
      // Serializable, deliberately)
      s"${ev.value} = graft.ops.PublicSuffixList$$.MODULE$$.fold($h);")

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomainExpr =
    copy(child = newChild)
}

object RegistrableDomainExpr {
  /** Column API. */
  def registrableDomain(host: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      RegistrableDomainExpr(org.apache.spark.sql.GraftShim.expression(host)))

  /** SQL registration: `SELECT registrable_domain(host)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "registrable_domain",
      exprs => {
        require(exprs.length == 1, "registrable_domain(host) takes 1 argument")
        RegistrableDomainExpr(exprs.head)
      }, "scala_udf")
}
