package graft.dag

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.dag.TaskRunner._

class TaskRunnerSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("dagspec").toString

  private def fileTask(dir: String, name: String, deps: Seq[Task] = Nil,
      log: StringBuilder = new StringBuilder): Task = {
    val t = FileTarget(s"$dir/$name")
    Task(name, t, deps, body = () => {
      log.append(name).append(";")
      Files.writeString(Paths.get(t.path), name)
    })
  }

  test("topological order: deps run before dependents, each task once") {
    val dir = tmpDir()
    val log = new StringBuilder
    val a = fileTask(dir, "a", Nil, log)
    val b = fileTask(dir, "b", Seq(a), log)
    val c = fileTask(dir, "c", Seq(a), log)
    val d = fileTask(dir, "d", Seq(b, c), log)
    val report = TaskRunner.run(Seq(d))
    assert(log.toString == "a;b;c;d;")
    assert(report.ran == Seq("a", "b", "c", "d"))
  }

  test("memoization: existing target skips the task AND its body") {
    val dir = tmpDir()
    val log = new StringBuilder
    val a = fileTask(dir, "a", Nil, log)
    TaskRunner.run(Seq(a))
    val log2 = new StringBuilder
    val a2 = fileTask(dir, "a", Nil, log2)
    val report = TaskRunner.run(Seq(a2))
    assert(log2.isEmpty)
    assert(report.skipped == Seq("a"))
  }

  test("external input: missing fails fast, present is a silent leaf") {
    val dir = tmpDir()
    val ext = external("input", FileTarget(s"$dir/in.csv"))
    val t = fileTask(dir, "t", Seq(ext))
    val e = intercept[IllegalStateException](TaskRunner.run(Seq(t)))
    assert(e.getMessage.contains("external input missing"))
    Files.writeString(Paths.get(s"$dir/in.csv"), "x")
    assert(TaskRunner.run(Seq(t)).ran == Seq("t"))
  }

  // note: dependency cycles are unrepresentable — Task is an immutable
  // case class, so a cyclic graph cannot even be constructed; the
  // runner's inStack guard is defensive only.

  test("task must commit its target") {
    val dir = tmpDir()
    val t = Task("noop", FileTarget(s"$dir/never"), body = () => ())
    val e = intercept[IllegalStateException](TaskRunner.run(Seq(t)))
    assert(e.getMessage.contains("without committing"))
  }

  test("runParallel: dependency order held under concurrency, every task once") {
    val dir = tmpDir()
    val starts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val ends = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def timed(name: String, deps: Seq[Task]): Task = {
      val target = FileTarget(s"$dir/$name")
      Task(name, target, deps, body = () => {
        starts.put(name, System.nanoTime())
        Thread.sleep(30)
        Files.writeString(Paths.get(target.path), name)
        ends.put(name, System.nanoTime())
      })
    }
    val root = timed("root", Nil)
    val mids = (0 until 8).map(i => timed(s"mid_$i", Seq(root)))
    val leaf = timed("leaf", mids)
    val report = TaskRunner.runParallel(Seq(leaf), parallelism = 4)
    assert(report.ran.size == 10)
    mids.foreach { m =>
      assert(starts.get(m.name) >= ends.get("root"), s"${m.name} started before root ended")
    }
    assert(starts.get("leaf") >= mids.map(m => ends.get(m.name)).max)
    // 8 x 30ms mids at parallelism 4 must overlap: strictly serial would
    // give 8 disjoint intervals; require at least one overlapping pair
    val intervals = mids.map(m => (starts.get(m.name), ends.get(m.name)))
    val overlapping = intervals.combinations(2).exists { case Seq((s1, e1), (s2, e2)) =>
      s1 < e2 && s2 < e1
    }
    assert(overlapping, "expected concurrent mid-task execution")
  }

  test("runParallel: failure stops new submissions and rethrows") {
    val dir = tmpDir()
    val a = fileTask(dir, "a")
    val boom = Task("boom", FileTarget(s"$dir/boom"), Seq(a),
      body = () => throw new RuntimeException("kaput"))
    val after = Task("after", FileTarget(s"$dir/after"), Seq(boom),
      body = () => Files.writeString(Paths.get(s"$dir/after"), "x"))
    val e = intercept[RuntimeException](TaskRunner.runParallel(Seq(after), 4))
    assert(e.getMessage == "kaput")
    assert(!Files.exists(Paths.get(s"$dir/after")), "dependent must not run after failure")
  }

  test("cleanup deletes consumed targets after the consumer commits") {
    val dir = tmpDir()
    val a = fileTask(dir, "a")
    val bTarget = FileTarget(s"$dir/b")
    val b = Task("b", bTarget, Seq(a),
      body = () => Files.writeString(Paths.get(bTarget.path), "b"),
      cleanup = Seq(a.target))
    TaskRunner.run(Seq(b))
    assert(!a.target.exists && bTarget.exists)
  }
}
