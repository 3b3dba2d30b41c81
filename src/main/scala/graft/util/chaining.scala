package graft.util

/**
 * Method-chaining sugar for pipeline code (capability parity with the
 * reference's AnyExtensions, reference:
 * alchemy/src/main/scala/com/swoop/alchemy/utils/AnyExtensions.scala:9-183):
 * conditional transforms, side-effecting taps, and guarded throws, all
 * usable mid-chain on any value (most usefully on DataFrames).
 *
 * {{{
 *   df.transformWhen(pruneCols)(_.select("a", "b"))
 *     .tap(d => log.info(s"rows=${d.count()}"))
 *     .throwWhen(_.isEmpty, new IllegalStateException("empty input"))
 * }}}
 */
object chaining {

  implicit class GraftPipeOps[A](private val self: A) extends AnyVal {

    /** Apply `f` (plain forward pipe). */
    def transform[B](f: A => B): B = f(self)

    /** Apply `f` only when `condition` is true; identity otherwise. */
    def transformWhen(condition: Boolean)(f: A => A): A =
      if (condition) f(self) else self

    /** Apply `f` only when the predicate holds; identity otherwise. */
    def transformIf(predicate: A => Boolean)(f: A => A): A =
      if (predicate(self)) f(self) else self

    /** Run a side effect and return the value unchanged. */
    def tap(effect: A => Unit): A = {
      effect(self)
      self
    }

    /** Run a side effect only when `condition` is true. */
    def tapWhen(condition: Boolean)(effect: A => Unit): A = {
      if (condition) effect(self)
      self
    }

    /** Run a side effect only when the predicate holds. */
    def tapIf(predicate: A => Boolean)(effect: A => Unit): A = {
      if (predicate(self)) effect(self)
      self
    }

    /** Print the value and pass it through. */
    def tapPrint(prefix: String = ""): A = tap(v => println(s"$prefix$v"))

    /** Throw when `condition` is true; pass through otherwise. */
    def throwWhen(condition: Boolean, error: => Throwable): A =
      if (condition) throw error else self

    /** Throw when the predicate holds; pass through otherwise. */
    def throwIf(predicate: A => Boolean)(error: => Throwable): A =
      if (predicate(self)) throw error else self
  }
}
