package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame

/** Multi-micro-batch replay fixture: stages a sequence of frames as ONE
  * parquet file each inside a fresh stream directory, with strictly
  * increasing file names AND modification times, so a file-stream read
  * with `maxFilesPerTrigger=1` processes them as one micro-batch per
  * stage IN STAGE ORDER (the file source orders pending files by
  * modification time; the names make the order visible to humans).
  *
  * This is what lets a bounded `Trigger.AvailableNow` replay exercise
  * WATERMARK semantics: a single-file replay is one batch with one
  * final watermark, so nothing is ever late — with staged files, the
  * watermark advances between batches and later stages can carry
  * genuinely late rows (the g10 late-data gate).
  */
object StagedReplay {

  /** Write `stages` under `dir` (wiped first). Returns `dir`. */
  def stageFiles(stages: Seq[DataFrame], dir: String): String = {
    val root = Paths.get(dir)
    graft.Scratch.deleteRecursively(root)
    Files.createDirectories(root)
    val base = System.currentTimeMillis()
    stages.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$dir/_stage_$i"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val listing = Files.list(Paths.get(tmp))
      val part =
        try listing.toArray.map(_.toString)
          .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
          .head
        finally listing.close()
      val target = root.resolve(f"stage_$i%04d.parquet")
      Files.move(Paths.get(part), target,
        StandardCopyOption.REPLACE_EXISTING)
      // strictly increasing mtimes pin the replay order regardless of
      // how fast the stages were written
      Files.setLastModifiedTime(target,
        FileTime.fromMillis(base + i * 2000L))
      graft.Scratch.deleteRecursively(Paths.get(tmp))
    }
    dir
  }
}
