package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKBySpec extends AnyFunSuite {
  private def drain(b: TopKBuffer): Seq[(Double, Long)] =
    (0 until b.n).map(i => (b.ords(i), b.ids(i)))

  test("buffer keeps k best ordered by (ord desc, id asc)") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 20L), (3.0, 30L), (9.0, 40L), (2.0, 50L))
      .foreach { case (o, i) => b.insert(o, i) }
    assert(drain(b) == Seq((9.0, 40L), (5.0, 20L), (3.0, 30L)))
  }

  test("ties break by smaller id; duplicates of ord allowed") {
    val b = new TopKBuffer(2)
    Seq((4.0, 9L), (4.0, 3L), (4.0, 7L)).foreach { case (o, i) => b.insert(o, i) }
    assert(drain(b) == Seq((4.0, 3L), (4.0, 7L)))
  }

  test("merge equals inserting everything into one buffer") {
    val rnd = new scala.util.Random(5)
    val items = (1 to 200).map(i => (rnd.nextInt(50).toDouble, i.toLong))
    val single = new TopKBuffer(5)
    items.foreach { case (o, i) => single.insert(o, i) }
    val parts = items.grouped(37).map { chunk =>
      val b = new TopKBuffer(5)
      chunk.foreach { case (o, i) => b.insert(o, i) }
      b
    }
    val merged = parts.reduceLeft { (a, c) => a.merge(c); a }
    assert(drain(merged) == drain(single))
  }

  test("fewer than k items") {
    val b = new TopKBuffer(10)
    b.insert(2.0, 1L); b.insert(7.0, 2L)
    assert(drain(b) == Seq((7.0, 2L), (2.0, 1L)))
  }
}
