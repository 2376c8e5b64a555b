package graft.tools

/** One-off diagnostic: run a JSON array of query strings (extracted from
  * the reference's own parser tests) through our VelesQL parser and
  * report which fail to parse. Not part of the driver contract — a
  * coverage sweep tool (results feed parser fixes + COVERAGE.md).
  */
object ParseSweep {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/ref_queries.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(new java.io.File(path))
    var ok = 0
    var fail = 0
    val it = arr.elements()
    while (it.hasNext) {
      val q = it.next().asText()
      graft.velesql.Parser.parse(q) match {
        case Right(_) => ok += 1
        case Left(err) =>
          fail += 1
          println(s"FAIL: $q\n  -> ${err.linesIterator.next()}")
      }
    }
    println(s"\n$ok parsed, $fail failed")
  }
}
