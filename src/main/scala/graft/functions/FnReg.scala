package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Arity guard shared by every function-registry builder. SQL can call a
  * registered function with any argument count; a builder that indexes
  * `exprs` blindly turns a user typo into an
  * `IndexOutOfBoundsException` — this wraps the builder so the wrong
  * count raises the standard `WRONG_NUM_ARGS` `AnalysisException`
  * naming the function and the expected arity.
  */
object FnReg {

  /** Builder accepting exactly `arity` arguments. */
  def checked(name: String, arity: Int)(
      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    checkedRange(name, arity, arity)(builder)

  /** Builder accepting `min` to `max` arguments inclusive. */
  def checkedRange(name: String, min: Int, max: Int)(
      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length < min || exprs.length > max)
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> (min to max).mkString(", "),
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      builder(exprs)
    }
}
