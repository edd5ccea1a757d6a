ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sociallinkspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Heap sizing + lifetime (BENCH/raw_r5.md "page-materialization
  // forensics"): this guest materializes fresh anonymous pages slowly
  // (~0.1-1.5 GiB/s, windowed) and in-process concurrent faulting is
  // pathological — sysrq-l during storm phases showed 14-16 CPUs inside
  // clear_page_erms and stime 10-37x utime in executor task threads.
  // Without -Xms, G1 grows/shrinks the committed heap continuously, so
  // the JVM re-faults fresh pages all run long; THAT was the round-4/5
  // "±40-60% window noise" (runs were fast only while the heap happened
  // to stay committed). Fix: commit the heap ONCE (Xms=Xmx) and fault it
  // ONCE, up front (AlwaysPreTouch), outside the measured jobs. Measured
  // on the identical job (300k files, local[32], same boot, min of 2):
  // 80.0-128.6 s -> 11.0 s. 24g beats 48g here: same run time (11.0 vs
  // 11.7 s) at a quarter of the pre-touch startup cost; a 16g/12g heap
  // adds GC pressure at local[32] with no further win.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
