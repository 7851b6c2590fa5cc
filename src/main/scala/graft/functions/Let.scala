package graft.functions

/** SQL-expression let-binding.
  *
  * Spark evaluates higher-order-function lambdas interpreted (no
  * codegen) and performs no common-subexpression elimination inside
  * them, so an expensive subexpression like `split(text, ' ')`
  * written inline in a lambda body is re-evaluated on EVERY lambda
  * iteration — O(len²) per row for shingling/bigram shapes.
  *
  * `transform` over a one-element array is the standard SQL trick to
  * force single evaluation: the input expression is computed once per
  * row, bound to the lambda variable, and every reference in the body
  * reads the bound value.
  */
object Let {

  /** `let varName = input in body` as a SQL expression string: `input`
    * is evaluated exactly once per row; `body` refers to it by
    * `varName`. Nestable (bind tokens, then bind scores over them). */
  def let1(input: String, varName: String)(body: String): String =
    s"element_at(transform(array($input), $varName -> $body), 1)"
}
