package graft.template

import java.time.{ZoneId, ZonedDateTime}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Template engine parity with the reference's DSL (README.md:50-95,
  * OldFullKeyFormatters.java:29-50). */
class TemplateSpec extends AnyFunSuite {

  private def render(tpl: String, bindings: Map[String, Template.VarBinding]) =
    Template.of(tpl).render(bindings)

  test("plain variables render in place") {
    val t = render("{{topic}}-{{partition}}-{{start_offset}}",
      Map("topic" -> Template.VarBinding.const("mytopic"),
        "partition" -> Template.VarBinding.padded(1),
        "start_offset" -> Template.VarBinding.padded(42)))
    assert(t == "mytopic-1-42")
  }

  test("padding=true renders %020d like the reference") {
    // README.md:68: {{topic}}-{{partition}}-{{start_offset:padding=true}}.gz
    // -> mytopic-1-00000000000000000001.gz
    val t = render("{{topic}}-{{partition}}-{{start_offset:padding=true}}.gz",
      Map("topic" -> Template.VarBinding.const("mytopic"),
        "partition" -> Template.VarBinding.paddedPartition(1),
        "start_offset" -> Template.VarBinding.padded(1)))
    assert(t == "mytopic-1-00000000000000000001.gz")
  }

  test("partition padding is 10 digits, not 20 (README.md:73)") {
    // {{topic}}-{{partition:padding=true}}-{{start_offset}}.gz
    // -> mytopic-0000000001-1.gz
    val t = render("{{topic}}-{{partition:padding=true}}-{{start_offset}}.gz",
      Map("topic" -> Template.VarBinding.const("mytopic"),
        "partition" -> Template.VarBinding.paddedPartition(1),
        "start_offset" -> Template.VarBinding.padded(1)))
    assert(t == "mytopic-0000000001-1.gz")
  }

  test("timestamp units format in the configured zone") {
    val ts = ZonedDateTime.of(2020, 3, 1, 7, 0, 0, 0, ZoneId.of("Z"))
    val t = render(
      "{{topic}}-{{timestamp:unit=yyyy}}{{timestamp:unit=MM}}{{timestamp:unit=dd}}",
      Map("topic" -> Template.VarBinding.const("mytopic"),
        "timestamp" -> Template.VarBinding.timestamp(ts)))
    assert(t == "mytopic-20200301")
  }

  test("whitespace inside braces is tolerated") {
    assert(render("{{ topic }}/x", Map("topic" -> Template.VarBinding.const("t")))
      == "t/x")
  }

  test("literal-only templates pass through (100 scalacheck samples)") {
    val gen = Gen.asciiPrintableStr.suchThat(!_.contains("{{"))
    (0 until 100).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach { s =>
        assert(render(s, Map.empty) == s)
      }
    }
  }

  test("variableNames drives grouping-mode resolution sets") {
    assert(Template.of("{{key}}").variableNames == Set("key"))
    assert(Template.of("{{topic}}-{{partition}}-{{start_offset}}").variableNames ==
      Set("topic", "partition", "start_offset"))
  }

  test("validate rejects unknown variables with the reference's message") {
    val errs = Template.validate(Template.of("{{nope}}"), Template.FilenameVars)
    assert(errs.exists(_.contains("unsupported set of template variables")))
  }

  test("validate rejects bad timestamp unit") {
    val errs = Template.validate(
      Template.of("{{timestamp:unit=ss}}"), Template.FilenameVars)
    assert(errs.exists(_.contains("unsupported value `ss` for parameter `unit`")))
  }

  test("prefix vars allow utc_date/local_date") {
    val now = java.time.Instant.parse("2021-06-15T10:00:00Z")
    val b = Template.dateBindings(now, ZoneId.of("Z"))
    assert(render("{{utc_date}}", b) == "2021-06-15")
  }

  test("unbound variable raises") {
    assertThrows[IllegalArgumentException](render("{{topic}}", Map.empty))
  }

  test("padding law: 20 chars, numeric round-trip (200 scalacheck longs)") {
    val gen = Gen.chooseNum(0L, Long.MaxValue / 2)
    (0 until 200).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach { n =>
        val r = render("{{start_offset:padding=true}}",
          Map("start_offset" -> Template.VarBinding.padded(n)))
        assert(r.length == math.max(20, n.toString.length))
        assert(r.toLong == n)
      }
    }
  }

  test("session tuning sizes shuffle partitions to the data") {
    val t = graft.GraftSession.tuneFor(
      totalDataBytes = 100L * 1024 * 1024 * 1024 * 1024, // 100 TB
      executorCores = 1000 * 8)
    assert(t("spark.sql.shuffle.partitions").toLong == 819200) // 100TB/128MB
    val small = graft.GraftSession.tuneFor(1024L * 1024, 32)
    assert(small("spark.sql.shuffle.partitions").toLong == 64) // core floor
  }
}
