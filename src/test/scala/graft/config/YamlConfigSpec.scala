package graft.config

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class YamlConfigSpec extends AnyFunSuite {

  private def writeConfigs(): String = {
    val dir = Files.createTempDirectory("cfg").toString
    Files.writeString(Paths.get(dir, "base.yaml"),
      """input_dir: "in"
        |valid_num_days: 20
        |store_list: ["A", "B"]
        |lgb_params:
        |  n_estimators: 2000
        |  learning_rate: 0.1
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "quick.yaml"),
      """valid_num_days: 5
        |lgb_params:
        |  n_estimators: 2
        |""".stripMargin)
    dir
  }

  test("layered merge: override wins per TOP-LEVEL key (maps replace, not deep-merge)") {
    val dir = writeConfigs()
    val cfg = YamlConfig.layered(dir, "quick")
    assert(cfg.getString("input_dir") == "in")     // from base
    assert(cfg.getInt("valid_num_days") == 5)      // overridden
    assert(cfg.getStringList("store_list") == Seq("A", "B"))
    val lgb = cfg.getMap("lgb_params")
    assert(lgb("n_estimators").toString.toInt == 2)
    // shallow-merge semantics ({**base, **override}): learning_rate is
    // GONE because the override replaced the whole lgb_params map
    assert(!lgb.contains("learning_rate"))
  }

  test("manifest dump round-trips through yaml") {
    val dir = writeConfigs()
    val cfg = YamlConfig.layered(dir, "quick")
    val manifest = s"$dir/out/params.yaml"
    cfg.dumpManifest(manifest)
    val re = YamlConfig.single(manifest)
    assert(re.getInt("valid_num_days") == 5)
    assert(re.getString("input_dir") == "in")
  }

  test("missing key fails with the key name") {
    val dir = writeConfigs()
    val cfg = YamlConfig.layered(dir, "quick")
    val e = intercept[NoSuchElementException](cfg.getString("nope"))
    assert(e.getMessage.contains("nope"))
  }
}
