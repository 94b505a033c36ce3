package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo's 60-bit md5-derived word hash as ONE native expression —
  * value-identical to `conv(substring(md5(s), 1, 15), 16, 10)::long`
  * (TextOps.wordHash's composed form, mirrored by the DuckDB oracles as
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`): the first 15 hex digits
  * of the md5 digest are its first 60 bits, i.e. the big-endian first 8
  * bytes shifted right 4.
  *
  * The composed form allocates a 32-char hex string, substrings it, and
  * re-parses 15 hex chars per call; this reads the digest bytes directly
  * with a thread-local MessageDigest — the md5 itself is unchanged, so
  * every oracle comparison is unaffected. It is the hot inner hash of
  * minhash/LSH/simhash/fingerprint over ~100 calls per document.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix60"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60Util.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix60Util.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60Util {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    acc >>> 4 // first 15 hex digits = first 60 bits
  }
}

object Md5Prefix60 {
  /** Column-DSL entry point. */
  def apply(c: Column): Column = Bridge.column(Md5Prefix60(Bridge.expression(c)))
}
