package graft.util

import graft.util.chaining._
import org.scalatest.funsuite.AnyFunSuite

class ChainingSpec extends AnyFunSuite {

  test("transform variants") {
    assert(5.transform(_ * 2) === 10)
    assert(5.transformWhen(condition = true)(_ * 2) === 10)
    assert(5.transformWhen(condition = false)(_ * 2) === 5)
    assert(5.transformIf(_ > 3)(_ * 2) === 10)
    assert(5.transformIf(_ > 9)(_ * 2) === 5)
  }

  test("tap variants run side effects and pass the value through") {
    var seen = List.empty[Int]
    assert(1.tap(seen ::= _) === 1)
    assert(2.tapWhen(condition = true)(seen ::= _) === 2)
    assert(3.tapWhen(condition = false)(seen ::= _) === 3)
    assert(4.tapIf(_ % 2 == 0)(seen ::= _) === 4)
    assert(5.tapIf(_ % 2 == 0)(seen ::= _) === 5)
    assert(seen === List(4, 2, 1))
  }

  test("throw variants") {
    assert(1.throwWhen(condition = false, new IllegalStateException) === 1)
    intercept[IllegalStateException](1.throwWhen(condition = true, new IllegalStateException))
    assert(1.throwIf(_ > 5)(new IllegalStateException) === 1)
    intercept[IllegalStateException](9.throwIf(_ > 5)(new IllegalStateException))
  }
}
