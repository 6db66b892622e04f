package graft.tools
object GrepPages {
  def main(args: Array[String]): Unit = {
    val (pages, gold) = graft.fixtures.PageGen.corpus(150)
    val needle = args(0)
    pages.filter(_.text.contains(needle)).take(3).foreach(p =>
      println("PAGE[" + p.url + "]: " + p.text))
    gold.filter(g => g.subj.contains(needle) || g.obj.contains(needle))
      .take(10).foreach(println)
  }
}
