package graft.ops

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-only: a local filesystem that ANSWERS as scheme `s3` — every byte
  * lands on local disk (so specs need no real bucket), but path URIs carry
  * the scheme [[Fs]]'s atomicity guard classifies as non-atomic-rename.
  * Registered per-spec via `fs.s3.impl`; this exercises the real
  * scheme-dispatch seam: the rename-based swap protocol must REFUSE such
  * paths, the pointer-commit protocol must run on them unchanged.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("s3:///")
  override def getScheme: String = "s3"
}
