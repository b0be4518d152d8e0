package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.Registry
import graft.service.GraftService

/** CLI entry point — the twin of the reference's tiny `vechord`
  * launcher (/root/reference/vechord/cli.py:1-28, which boots the
  * Falcon service for a registry): `graft.Main serve [--port N]
  * [--root DIR] [--cpus N]` starts a SparkSession + Registry rooted at
  * `--root` and serves the HTTP control plane until the process is
  * stopped. `--root` defaults to a fresh temp dir (the cli.py
  * in-memory default), `--port 0` picks an ephemeral port. */
object Main {

  def main(args: Array[String]): Unit = args.toList match {
    case "serve" :: rest =>
      val svc = serve(parseOpts(rest))
      println(s"graft service listening on " +
        s"http://127.0.0.1:${svc.boundPort}")
      // the service's executor threads are non-daemon; block the main
      // thread so ^C / SIGTERM is the shutdown path
      val latch = new java.util.concurrent.CountDownLatch(1)
      sys.addShutdownHook { svc.stop(); latch.countDown() }
      latch.await()
    case _ =>
      System.err.println(
        "usage: graft.Main serve [--port N] [--root DIR] [--cpus N]")
      sys.exit(2)
  }

  /** Start the service from CLI-style options; returns the running
    * instance (tests drive this directly — ServiceSpec). */
  def serve(opts: Map[String, String]): GraftService = {
    val spark = SparkSession.builder()
      .master(s"local[${opts.getOrElse("cpus", "4")}]")
      .config("spark.sql.shuffle.partitions",
        opts.getOrElse("cpus", "4"))
      .config("spark.ui.enabled", "false")
      .appName("graft-serve")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = opts.getOrElse("root",
      Files.createTempDirectory("graft_serve").toString)
    val reg = new Registry(spark, root)
    new GraftService(reg, Nil, port = opts.getOrElse("port", "8000").toInt)
      .start()
  }

  /** `--key value` pairs → map (unknown keys rejected). */
  def parseOpts(args: List[String]): Map[String, String] = {
    val allowed = Set("port", "root", "cpus")
    args.grouped(2).map {
      case List(k, v) if k.startsWith("--") &&
          allowed(k.drop(2)) => k.drop(2) -> v
      case other => throw new IllegalArgumentException(
        s"bad option: ${other.mkString(" ")}")
    }.toMap
  }
}
