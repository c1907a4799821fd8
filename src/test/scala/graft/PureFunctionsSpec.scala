package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Glob

/** Pure-function properties (no SparkSession needed). */
class PureFunctionsSpec extends AnyFunSuite {

  test("globToRegex translates wildcards") {
    assert(Glob.globToRegex("*.csv") == "^.*\\.csv$")
    assert(Glob.globToRegex("data_?.json") == "^data_.\\.json$")
    assert("report.csv".matches(Glob.globToRegex("*.csv")))
    assert(!"report.csv.bak".matches(Glob.globToRegex("*.csv")))
    assert("a/b/c.csv".matches(Glob.globToRegex("*.csv"))) // fnmatch: * crosses separators
  }

  test("globToRegex escapes regex metacharacters") {
    for (meta <- Seq("a+b", "a(b)c", "a[b", "x{2}", "a|b", "a^b$")) {
      assert(meta.matches(Glob.globToRegex(meta)), s"glob '$meta' must match itself")
    }
  }

  test("globToRegex: fnmatch character classes [seq] and [!seq]") {
    assert("a.txt".matches(Glob.globToRegex("[abc].txt")))
    assert(!"d.txt".matches(Glob.globToRegex("[abc].txt")))
    assert("d.txt".matches(Glob.globToRegex("[!abc].txt")))
    assert(!"a.txt".matches(Glob.globToRegex("[!abc].txt")))
    assert("file7.log".matches(Glob.globToRegex("file[0-9].log")))
    assert(!"fileX.log".matches(Glob.globToRegex("file[0-9].log")))
    // leading ] inside the class is literal
    assert("]x".matches(Glob.globToRegex("[]a]x")))
    assert("ax".matches(Glob.globToRegex("[]a]x")))
  }

  test("cron nextFire: field kinds, day semantics, rollover") {
    import java.time.LocalDateTime
    import graft.pipeline.Cron
    val t = LocalDateTime.of(2026, 8, 12, 10, 30) // a Wednesday
    // plain next-minute match
    assert(Cron.nextFire("*/15 * * * *", t) == LocalDateTime.of(2026, 8, 12, 10, 45))
    // fire time equal to `after` is excluded (strictly after)
    assert(Cron.nextFire("30 10 * * *", t) == LocalDateTime.of(2026, 8, 13, 10, 30))
    // weekday constraint: 9:00 on Mon-Fri → same day later hour is fine
    assert(Cron.nextFire("0 9 * * 1-5", t) == LocalDateTime.of(2026, 8, 13, 9, 0))
    // Saturday spec (6) rolls to the coming Saturday
    assert(Cron.nextFire("5 6 * * 6", t) == LocalDateTime.of(2026, 8, 15, 6, 5))
    // month + day-of-month pinned → next year's Feb 28
    assert(Cron.nextFire("30 14 28 2 *", t) == LocalDateTime.of(2027, 2, 28, 14, 30))
    // vixie OR-semantics: dom 15 OR friday — friday the 14th comes first
    assert(Cron.nextFire("0 0 15 * 5", t) == LocalDateTime.of(2026, 8, 14, 0, 0))
    // day 7 == day 0 == sunday
    assert(Cron.nextFire("0 0 * * 7", t) == Cron.nextFire("0 0 * * 0", t))
    // impossible dates throw instead of looping forever
    intercept[IllegalArgumentException](Cron.nextFire("0 0 30 2 *", t))
    intercept[IllegalArgumentException](Cron.nextFire("bogus", t))
    // Feb 29 across the 2100 non-leap century boundary: 8-year gap must
    // stay inside the search horizon
    assert(Cron.nextFire("0 0 29 2 *", LocalDateTime.of(2096, 3, 1, 0, 0)) ==
      LocalDateTime.of(2104, 2, 29, 0, 0))
    // vixie N/step = "from N to max by step": 8/6 hours = 8, 14, 20
    assert(Cron.nextFire("0 8/6 * * *", LocalDateTime.of(2026, 8, 12, 0, 0)) ==
      LocalDateTime.of(2026, 8, 12, 8, 0))
    assert(Cron.nextFire("0 8/6 * * *", LocalDateTime.of(2026, 8, 12, 8, 30)) ==
      LocalDateTime.of(2026, 8, 12, 14, 0))
    assert(Cron.nextFire("0 8/6 * * *", LocalDateTime.of(2026, 8, 12, 20, 30)) ==
      LocalDateTime.of(2026, 8, 13, 8, 0))
  }

  test("property: cron nextFire is strictly-after and matches its spec") {
    import java.time.LocalDateTime
    import graft.pipeline.Cron
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      m <- Gen.choose(0, 59); h <- Gen.choose(0, 23)
      dow <- Gen.choose(0, 6)
      day <- Gen.choose(1, 28); month <- Gen.choose(1, 12)
      hour <- Gen.choose(0, 23); minute <- Gen.choose(0, 59)
    } yield (s"$m $h * * $dow", LocalDateTime.of(2026, month, day, hour, minute))
    val prop = Prop.forAll(gen) { case (expr, after) =>
      val fire = Cron.nextFire(expr, after)
      val Array(m, h, _, _, dow) = expr.split(" ")
      fire.isAfter(after) &&
        fire.getMinute == m.toInt && fire.getHour == h.toInt &&
        fire.getDayOfWeek.getValue % 7 == dow.toInt &&
        // minimality: no earlier matching instant in between (same spec
        // fires at most weekly, so the gap is bounded by 7 days)
        java.time.Duration.between(after, fire).toDays <= 7
    }
    assert(check(Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("scheduler model: arming, due selection, concurrency cap, one-shot disable") {
    import java.time.LocalDateTime
    import graft.pipeline.Scheduler
    import graft.pipeline.Scheduler._
    val now = LocalDateTime.of(2026, 8, 12, 10, 0)
    val cronJob = arm(Job("c1", "nightly", CronSchedule("0 2 * * *")), now)
    assert(cronJob.nextRun.contains(LocalDateTime.of(2026, 8, 13, 2, 0)))
    val every5m = arm(Job("i1", "poll", IntervalSchedule(300)), now)
    assert(every5m.nextRun.contains(now.plusSeconds(300)))
    val once = arm(Job("o1", "migrate", OnceSchedule(now.plusMinutes(1))), now)

    // nothing due yet
    assert(Scheduler.due(Seq(cronJob, every5m, once), now).isEmpty)
    // at +5m the interval and once jobs are both due; capacity 2 admits both
    val t5 = now.plusMinutes(5)
    assert(Scheduler.due(Seq(cronJob, every5m, once), t5).map(_.id).toSet == Set("i1", "o1"))
    // longest-overdue wins the single remaining slot (once armed at +1m)
    assert(Scheduler.due(Seq(cronJob, every5m, once), t5, running = Set("x"), maxConcurrent = 2)
      .map(_.id) == Seq("o1"))
    // a running job is never double-started; capacity 0 admits nothing
    assert(Scheduler.due(Seq(every5m), t5, running = Set("i1")).isEmpty)
    assert(Scheduler.due(Seq(every5m), t5, running = Set("a", "b")).isEmpty)
    // disabled jobs are never armed or selected
    assert(arm(Job("d", "off", IntervalSchedule(10), enabled = false), now).nextRun.isEmpty)

    // one-shot disables itself after running; interval re-arms from now
    val ranOnce = afterRun(once, t5)
    assert(!ranOnce.enabled && ranOnce.nextRun.isEmpty && ranOnce.lastRun.contains(t5))
    val ranInterval = afterRun(every5m, t5)
    assert(ranInterval.enabled && ranInterval.nextRun.contains(t5.plusSeconds(300)))
  }

  test("globToLike translates and escapes") {
    assert(Glob.globToLike("*.csv") == "%.csv")
    assert(Glob.globToLike("a?c") == "a_c")
    assert(Glob.globToLike("100%_done*") == "100\\%\\_done%")
    // literal backslash (Windows paths) must be doubled: '\' is the
    // LIKE escape character
    assert(Glob.globToLike("C:\\Win\\*") == "C:\\\\Win\\\\%")
  }

  test("property: literal globs (no wildcards) match themselves") {
    // `[` excluded: a terminated [seq] is a character class under
    // fnmatch, so strings containing one are NOT literal globs
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf("./-_+(){}^$|\\]".toSeq)))
      .map(_.mkString)
    val prop = Prop.forAll(gen) { s => s.matches(Glob.globToRegex(s)) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash coefficients are distinct and in range") {
    val cs = graft.functions.Hashing.minhashCoeffs(128)
    assert(cs.distinct.size == 128)
    assert(cs.forall { case (a, b) =>
      a > 0 && a < graft.functions.Hashing.MinHashP && b >= 0 && b < graft.functions.Hashing.MinHashP
    })
  }

  // ------------------------------------------------------ config overlay

  test("config yaml subset: sections, deep nesting, lists, quotes, comments") {
    import graft.pipeline.GraftConfig
    // shape mirrors the reference's own config.yaml
    val m = GraftConfig.parseYaml(
      """# engine config
        |agent:
        |  name: "FileSystemAgent"  # trailing comment
        |  log_level: INFO
        |etl:
        |  max_workers: 4
        |  supported_formats:
        |    - csv
        |    - json
        |    - parquet
        |audit:
        |  tools:
        |    sigcheck:
        |      target_path: "C:\\Windows\\System32"
        |top: 'it''s flat'
        |""".stripMargin)
    assert(m("agent.name") == "FileSystemAgent")
    assert(m("agent.log_level") == "INFO")
    assert(m("etl.max_workers") == "4")
    assert(m("etl.supported_formats") == "csv,json,parquet")
    assert(m("audit.tools.sigcheck.target_path") == "C:\\Windows\\System32")
    assert(m("top") == "it's flat")
    // zero-indent list style (item at the key's own indent) is in contract
    val z = GraftConfig.parseYaml("formats:\n- csv\n- json\nnext: 1\ndeep:\n  inner:\n  - a\n  - b\n")
    assert(z("formats") == "csv,json" && z("next") == "1" && z("deep.inner") == "a,b")
    // quoted list scalars may contain ': '
    assert(GraftConfig.parseYaml("xs:\n  - \"k: v\"\n")("xs") == "k: v")
    // out-of-contract inputs fail loudly, never mis-parse
    intercept[IllegalArgumentException](GraftConfig.parseYaml("a:\n\tb: 1"))
    intercept[IllegalArgumentException](GraftConfig.parseYaml("- orphan item"))
    // block sequences of mappings would silently re-attach continuation
    // lines to the parent — rejected loudly
    intercept[IllegalArgumentException](GraftConfig.parseYaml("xs:\n  - name: a\n    path: b\n"))
    intercept[IllegalArgumentException](GraftConfig.parseYaml("xs:\n  - opens:\n"))
    // a mis-indented item must not silently attach to an ancestor key:
    // `a` would become both a map (a.b) and a list
    intercept[IllegalArgumentException](GraftConfig.parseYaml("a:\n  b: 1\n- x\n"))
    intercept[IllegalArgumentException](
      GraftConfig.parseYaml("parent:\n  child:\n    - a\n- b\n"))
    intercept[IllegalArgumentException](GraftConfig.parseYaml("a:\n  b: 1\n  - x\n"))
    // indent drift WITHIN a list is a nested sequence in real YAML —
    // flattening it silently would mis-parse, so it fails loudly
    intercept[IllegalArgumentException](GraftConfig.parseYaml("a:\n  - x\n      - y\n"))
    intercept[IllegalArgumentException](GraftConfig.parseYaml("a:\n    - x\n  - y\n"))
  }

  test("config precedence: env overrides yaml overrides defaults (reference config.py:14-57)") {
    import graft.pipeline.GraftConfig
    val yaml = java.nio.file.Files.createTempFile("graft-conf", ".yaml")
    java.nio.file.Files.writeString(yaml,
      """agent:
        |  log_level: INFO
        |  data_dir: ./data
        |scheduler:
        |  check_interval: 60
        |""".stripMargin)
    val defaults = Map(
      "agent.log_level" -> "DEBUG", // yaml beats this
      "agent.scripts_dir" -> "./scripts") // nothing overrides this
    val env = Map(
      "GRAFT_AGENT_LOG_LEVEL" -> "WARN", // beats yaml: section AGENT, key LOG_LEVEL
      "GRAFT_VERBOSE" -> "true", // no underscore → top-level key
      "HOME" -> "/root") // non-prefixed vars are ignored
    val c = GraftConfig.load(yaml, defaults, env)
    assert(c.getOrElse("agent.log_level", "?") == "WARN", "env must beat yaml")
    assert(c.getOrElse("agent.data_dir", "?") == "./data", "yaml must beat defaults")
    assert(c.getOrElse("agent.scripts_dir", "?") == "./scripts", "defaults must survive")
    assert(c.getBoolean("verbose", false) && c.get("home").isEmpty)
    assert(c.getInt("scheduler.check_interval", -1) == 60)
    assert(c.section("agent") == Map(
      "log_level" -> "WARN", "data_dir" -> "./data", "scripts_dir" -> "./scripts"))
    // typed getters: malformed present values are errors, not defaults
    intercept[IllegalArgumentException](c.getInt("agent.log_level", 0))
    // missing file: load throws (reference FileNotFoundError parity),
    // loadOrDefaults overlays env on defaults only
    val gone = java.nio.file.Paths.get("/tmp/graft-no-such-config.yaml")
    intercept[java.io.FileNotFoundException](GraftConfig.load(gone, defaults, env))
    val c2 = GraftConfig.loadOrDefaults(gone, defaults, env)
    assert(c2.getOrElse("agent.log_level", "?") == "WARN")
    assert(c2.get("agent.data_dir").isEmpty)
    java.nio.file.Files.delete(yaml)
  }

  test("GraftSession knobs resolve through the config overlay") {
    // no file, no env → builder defaults survive
    val d = graft.GraftSession.knobs("32", env = Map.empty)
    assert(d.getInt("session.shuffle_partitions", -1) == 32)
    assert(d.getOrElse("session.timezone", "?") == "UTC")
    assert(d.getOrElse("session.broadcast_threshold_bytes", "?") == (64L * 1024 * 1024).toString)
    // GRAFT_SESSION_* env overrides the default; GRAFT_CONFIG points at yaml
    val yaml = java.nio.file.Files.createTempFile("graft-sess", ".yaml")
    java.nio.file.Files.writeString(yaml, "session:\n  timezone: America/New_York\n")
    val o = graft.GraftSession.knobs("32", env = Map(
      "GRAFT_CONFIG" -> yaml.toString,
      "GRAFT_SESSION_SHUFFLE_PARTITIONS" -> "96"))
    assert(o.getInt("session.shuffle_partitions", -1) == 96, "env must beat builder default")
    assert(o.getOrElse("session.timezone", "?") == "America/New_York", "yaml must beat default")
    // the overlay is scoped to GRAFT_SESSION_*: unrelated GRAFT_* vars
    // (and GRAFT_CONFIG itself) must not leak into the knob map
    val s = graft.GraftSession.knobs("32", env = Map(
      "GRAFT_CONFIG" -> yaml.toString,
      "GRAFT_AGENT_LOG_LEVEL" -> "WARN",
      "GRAFT_VERBOSE" -> "true"))
    assert(s.get("agent.log_level").isEmpty && s.get("verbose").isEmpty
      && s.get("config").isEmpty, "non-session GRAFT_* vars must not leak into knobs")
    // the YAML layer is opt-in: no GRAFT_CONFIG → no file read at all;
    // an explicitly named but missing file fails loudly
    java.nio.file.Files.delete(yaml)
    intercept[java.io.FileNotFoundException](
      graft.GraftSession.knobs("32", env = Map("GRAFT_CONFIG" -> yaml.toString)))
  }
}
