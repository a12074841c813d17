package graft.config

import java.io.{FileInputStream, FileWriter}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** O39 — layered run configuration: a base yaml shallow-merged with a
  * named override yaml, exactly the reference's `{**base, **override}`
  * semantics (top-level keys only; an override's `lgb_params` REPLACES
  * the base's whole map, it does not deep-merge).
  * Ref: common.py:12-30, the config yaml set.
  *
  * Values are held as the untyped snakeyaml tree; typed getters do the
  * narrowing at the call site so a bad config fails fast with the key
  * name in the error.
  */
final class YamlConfig private (private val values: Map[String, Any]) {

  private def get(key: String): Any =
    values.getOrElse(key, throw new NoSuchElementException(s"config key not found: $key"))

  def getString(key: String): String = get(key).toString
  def getInt(key: String): Int = get(key) match {
    case n: java.lang.Number => n.intValue()
    case other => other.toString.toInt
  }
  def getDouble(key: String): Double = get(key) match {
    case n: java.lang.Number => n.doubleValue()
    case other => other.toString.toDouble
  }
  def getStringList(key: String): Seq[String] = get(key) match {
    case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
    case other => throw new IllegalArgumentException(s"config key $key is not a list: $other")
  }
  def getIntList(key: String): Seq[Int] = get(key) match {
    case l: java.util.List[_] => l.asScala.map {
      case n: java.lang.Number => n.intValue()
      case s => s.toString.toInt
    }.toSeq
    case other => throw new IllegalArgumentException(s"config key $key is not a list: $other")
  }
  def getMap(key: String): Map[String, Any] = get(key) match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
    case other => throw new IllegalArgumentException(s"config key $key is not a map: $other")
  }
  def contains(key: String): Boolean = values.contains(key)

  def withOverrides(overrides: Map[String, Any]): YamlConfig =
    new YamlConfig(values ++ overrides)

  /** O6 — run-manifest sink: dump the RESOLVED config next to the run's
    * outputs so every artifact directory records exactly the parameters
    * that produced it. Ref: common.py:28-30 (params.yaml). */
  def dumpManifest(path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    val w = new FileWriter(path)
    try new Yaml().dump(values.asJava, w) finally w.close()
  }

  def toMap: Map[String, Any] = values
}

object YamlConfig {

  private def loadOne(path: String): Map[String, Any] = {
    val in = new FileInputStream(path)
    try {
      val loaded = new Yaml().load[java.util.Map[String, Any]](in)
      if (loaded == null) Map.empty
      else loaded.asScala.toMap
    } finally in.close()
  }

  /** base.yaml + `<name>.yaml` from `configDir`, shallow-merged
    * (override wins per top-level key). */
  def layered(configDir: String, name: String): YamlConfig =
    new YamlConfig(loadOne(s"$configDir/base.yaml") ++ loadOne(s"$configDir/$name.yaml"))

  def single(path: String): YamlConfig = new YamlConfig(loadOne(path))

  def fromMap(values: Map[String, Any]): YamlConfig = new YamlConfig(values)
}
