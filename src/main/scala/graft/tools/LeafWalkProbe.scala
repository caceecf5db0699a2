package graft.tools

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.sources.{CommitProtocol, DayManifestCommit, RenameCommit}

/** Prices the DRIVER-SIDE leaf walk + manifest resolution at the width
  * where a 100× lake lives (VERDICT r19 #3): `ResolvedScan
  * .resolvedLeaves` walks every symbol-hour leaf dir driver-side per
  * windowed read — measured healthy at 24k leaves (0.77× identity on
  * the r19 ManifestCostProbe), unmeasured at 240k. This probe builds a
  * METADATA-ONLY lake (one tiny stand-in file per leaf — the walk and
  * the resolution never open data files, only list and read manifests)
  * at an arbitrary width and times:
  *
  *  1. the FULL walk + batch resolution (the scanAllSymbols shape);
  *  2. the 3-hour WINDOWED walk (the readWindowAllSymbols shape:
  *     `leafFilter` prunes by hour key BEFORE resolution);
  *  3. both again on an identical identity-committed tree (walk cost
  *     without manifest reads — the ratio baseline).
  *
  * The lake is committed through [[DayManifestCommit.publishBatch]], so
  * the build leg doubles as a first-publish timing at this width
  * (VERDICT r19 #4's parallel-publish path exercised at 10× the r19
  * probe's width).
  *
  * Run: `sbt "runMain graft.tools.LeafWalkProbe [width] [hours]"`
  * (defaults 10000, 24 — 240k leaves per lake).
  */
object LeafWalkProbe {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Driver-side parallel foreach — the probe builds hundreds of
    * thousands of dirs; sequential java.nio would dominate the wall. */
  private def par[A](items: Seq[A], threads: Int = 16)(f: A => Unit): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val fs = items.map(i => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = f(i)
      }))
      fs.foreach { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(10000)
    val hours = args.lift(1).flatMap(_.toIntOption).getOrElse(24)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = FileSystem.get(java.net.URI.create("file:///"), conf)
    val symbols = (0 until width).map(i => f"SYM$i%05d")
    val hourDirs = (0 until hours).map(h => f"hour=$h%02d")

    def leafDirsOf(root: String): Seq[(String, String)] =
      for (s <- symbols; h <- hourDirs)
        yield (s"$root/symbol=$s/year=2024/month=12/day=30", h)

    def buildLake(label: String, committer: CommitProtocol): String = {
      val root = java.nio.file.Files.createTempDirectory(s"graft-lw-$label").toString
      val lake = s"$root/futures/um/minute"
      val stage = s"$root/stage"
      val (_, stageSecs) = timed {
        par(leafDirsOf(stage)) { case (day, h) =>
          val d = java.nio.file.Paths.get(day, h)
          java.nio.file.Files.createDirectories(d)
          java.nio.file.Files.write(d.resolve("part-0.parquet"), Array[Byte](0))
        }
      }
      val pairs = leafDirsOf(stage).map { case (day, h) =>
        s"$day/$h" -> s"${day.replace(stage, lake)}/$h"
      }
      val (_, pubSecs) = timed {
        committer match {
          case b: DayManifestCommit => b.publishBatch(fs, pairs)
          case c => par(pairs)(p => c.publish(fs, p._1, p._2))
        }
      }
      println(f"[lw] $label%-9s build: stage=$stageSecs%6.1f s " +
        f"publish=$pubSecs%6.1f s (${pubSecs * 1e6 / pairs.length}%7.1f us/leaf, " +
        f"${pairs.length} leaves)")
      fs.delete(new HPath(stage), true)
      lake
    }

    // windowed filter: 3 h of the one day, the readWindowAllSymbols shape
    val lo = "2024123002"; val hi = "2024123004"
    def windowFilter(p: String): Boolean =
      graft.sources.MinuteLakeReader.hourKeyOf(p).forall(k => k >= lo && k <= hi)

    Seq[(String, CommitProtocol)](
      "identity" -> RenameCommit, "day-batch" -> DayManifestCommit
    ).foreach { case (label, committer) =>
      val lake = buildLake(label, committer)
      // warm the dentry cache once so both committers' timed walks see
      // the same page-cache state (the first walk of a fresh 240k-dir
      // tree pays cold-inode costs that belong to the FS, not the code)
      graft.sources.ResolvedScan.resolvedLeaves(fs, lake, committer)
      val (full, fullSecs) = timed {
        graft.sources.ResolvedScan.resolvedLeaves(fs, lake, committer)
      }
      val (win, winSecs) = timed {
        graft.sources.ResolvedScan.resolvedLeaves(fs, lake, committer,
          leafFilter = windowFilter)
      }
      println(f"[lw] $label%-9s full-walk: ${full.length}%7d leaves " +
        f"$fullSecs%6.2f s   3h-window: ${win.length}%7d leaves $winSecs%6.2f s")
      fs.delete(new HPath(lake).getParent.getParent.getParent, true)
    }
  }
}
