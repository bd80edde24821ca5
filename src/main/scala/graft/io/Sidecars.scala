package graft.io

import java.nio.file.{Files, Path, StandardCopyOption}

/** Shared atomic sidecar write for the incremental-store family
  * ([[MvIO]], [[TokenizerIO]], [[SketchIO]], [[DedupIndexIO]],
  * [[AnnIndexIO]], [[TileIO]]): a plain `Files.writeString` can be
  * torn by a crash mid-write, leaving a sidecar that EXISTS but is
  * truncated — which reads as "present but unparseable" and wedges
  * the store, breaking each store's "a torn write leaves no
  * observable trace" contract. Temp file + ATOMIC_MOVE makes every
  * marker either absent or complete.
  */
private[io] object Sidecars {
  def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
