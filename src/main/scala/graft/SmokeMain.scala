package graft
object SmokeMain {
  def main(a: Array[String]): Unit = {
    val s = GraftSession.local(8)
    val df = SparkEntry.entry(s)
    println("ENTRY_ROWS=" + df.count())
    df.show(false)
    s.stop()
  }
}
