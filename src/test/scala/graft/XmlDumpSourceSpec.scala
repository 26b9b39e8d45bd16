package graft

import org.apache.spark.sql.functions._
import graft.sources.XmlDumpSource

/** S1 XML page-dump source: a real mediawiki-shaped file read through the
  * `lineSep=</page>` scan (reference: `impl/wikipedia/xml_parser.py:11-53`).
  */
class XmlDumpSourceSpec extends SparkSuite {
  import spark.implicits._

  private val dump =
    """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/">
      |  <siteinfo><sitename>Test</sitename><dbname>tw</dbname></siteinfo>
      |  <page>
      |    <title>Alan Turing</title>
      |    <ns>0</ns>
      |    <revision><text xml:space="preserve">pioneer &amp; &lt;b&gt;computing&lt;/b&gt;</text></revision>
      |  </page>
      |  <page>
      |    <title>Template:Infobox</title>
      |    <ns>10</ns>
      |    <revision><text>{{infobox}}</text></revision>
      |  </page>
      |  <page>
      |    <title>Category:Scientists</title>
      |    <ns>14</ns>
      |    <revision><text bytes="0" /></revision>
      |  </page>
      |  <page>
      |    <title>Talk:Alan Turing</title>
      |    <ns>1</ns>
      |    <revision><text>dropped</text></revision>
      |  </page>
      |</mediawiki>
      |""".stripMargin

  test("file read: per-page records, ns filter, entity unescape") {
    val dir = SparkSuite.tempDir("graft-xml")
    val f = java.nio.file.Paths.get(dir, "dump.xml")
    java.nio.file.Files.write(f, dump.getBytes("UTF-8"))
    val rows = XmlDumpSource.readPages(spark, f.toString)
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("Alan Turing", "0", "pioneer & <b>computing</b>"),
      ("Template:Infobox", "10", "{{infobox}}"),
      // self-closing <text/> never matches the content regex → empty markup,
      // same as the SAX end-event with no data callback
      ("Category:Scientists", "14", "")))
  }

  test("split invariance: tiny maxPartitionBytes yields the identical page set") {
    val dir = SparkSuite.tempDir("graft-xml-split")
    val f = java.nio.file.Paths.get(dir, "big.xml")
    val sb = new StringBuilder("<mediawiki>\n")
    for (i <- 0 until 300) {
      sb.append(s"  <page>\n    <title>Page $i</title>\n    <ns>${Seq(0, 10, 14, 3)(i % 4)}</ns>\n")
      sb.append(s"    <revision><text>markup $i ${"x" * 50}</text></revision>\n  </page>\n")
    }
    sb.append("</mediawiki>\n")
    java.nio.file.Files.write(f, sb.toString.getBytes("UTF-8"))
    val whole = XmlDumpSource.readPages(spark, f.toString)
      .as[(String, String, String)].collect().toSet
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      val fine = XmlDumpSource.readPages(spark, f.toString)
      assert(fine.rdd.getNumPartitions > 4) // the scan actually split
      assert(fine.as[(String, String, String)].collect().toSet == whole)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert(whole.size == 225 && whole.contains(("Page 0", "0", "markup 0 " + "x" * 50)))
  }

  test("streaming dump ingest == batch read, across micro-batches") {
    val dir = SparkSuite.tempDir("graft-xml-stream")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.xml"), dump.getBytes("UTF-8"))
    val q = graft.streaming.StreamingIngest.streamingDumpPages(spark, dir)
      .writeStream.format("memory").queryName("xml_pages_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a second dump file lands → a second micro-batch, no state needed
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "b.xml"),
        dump.replace("Alan Turing", "Ada Lovelace").getBytes("UTF-8"))
      q.processAllAvailable()
      val streamed = spark.table("xml_pages_stream")
        .as[(String, String, String)].collect().toSet
      val batch = XmlDumpSource.readPages(spark, dir)
        .as[(String, String, String)].collect().toSet
      // 3 kept pages per file; the template/category rows coincide → 4 distinct
      assert(streamed == batch && streamed.size == 4)
      assert(spark.table("xml_pages_stream").count() == 6)
      assert(streamed.exists(_._1 == "Ada Lovelace"))
    } finally q.stop()
  }

  test("pagesFromDump yields the north-rule page table; invariant holds") {
    graft.core.Normalize.register(spark)
    val dir = SparkSuite.tempDir("graft-xml-pages")
    val f = java.nio.file.Paths.get(dir, "dump.xml")
    java.nio.file.Files.write(f, dump.getBytes("UTF-8"))
    val ts = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
    val pages = XmlDumpSource.pagesFromDump(spark, f.toString, ts)
    // names + types must match the north-rule schema (lit() columns are
    // non-nullable, which is a strictly stronger contract)
    assert(pages.schema.map(f => (f.name, f.dataType)) ==
           graft.streaming.StreamingIngest.pageSchema.map(f => (f.name, f.dataType)))
    // articles only (ns 0)
    val rows = pages.select("url", "text").as[(String, String)].collect()
    assert(rows.toSeq == Seq((
      "http://graft.example.org/resource/Alan_Turing",
      "pioneer & computing"))) // tags stripped AFTER entity-encoded markup decodes
    // the extraction invariant: the pipeline stage re-derives exactly text
    val ext = graft.ingest.TextExtract.extract(pages)
      .as[(String, String)].collect().toMap
    pages.select("url", "text").as[(String, String)].collect()
      .foreach { case (u, t) => assert(ext(u) == t) }
  }

  test("dump file in → KG out: identical triples to the direct-table run") {
    graft.core.Normalize.register(spark)
    val world = graft.testkit.CorpusGen.default
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // the dump is per-language (like the real export), so only en pages go
    // in; the direct run drops non-en via the extraction lang filter anyway
    val xml = world.pages.filter(_.lang == "en").map { p =>
      val markup = new String(p.html, "UTF-8")
      s"  <page>\n    <title>${esc(p.url)}</title>\n    <ns>0</ns>\n" +
        s"    <revision><text>${esc(markup)}</text></revision>\n  </page>"
    }.mkString("<mediawiki>\n", "\n", "\n</mediawiki>\n")
    val dir = SparkSuite.tempDir("graft-xml-kg")
    val f = java.nio.file.Paths.get(dir, "dump.xml")
    java.nio.file.Files.write(f, xml.getBytes("UTF-8"))
    val ts = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
    val dumpPages = XmlDumpSource.pagesFromDump(
      spark, f.toString, ts, urlOf = identity)
    val seeds = world.seeds(spark)
    val viaDump = graft.Pipeline.run(spark, dumpPages, seeds, s"$dir/outA")
    val direct = graft.Pipeline.run(
      spark, world.pages.toDS().toDF(), seeds, s"$dir/outB")
    // multiset-exact: exceptAll respects duplicate multiplicities, which a
    // pair of anti-joins plus a total-count check would not
    assert(viaDump.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaDump).count() == 0)
    assert(viaDump.count() > 0)
  }

  test("resourceIri matches the reference's title → IRI mapping") {
    graft.core.Normalize.register(spark)
    val iri = Seq("Alan Turing").toDF("t")
      .select(XmlDumpSource.resourceIri(col("t"))).as[String].head()
    assert(iri == "http://graft.example.org/resource/Alan_Turing")
  }
}
