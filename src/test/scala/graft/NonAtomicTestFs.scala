package graft

/** Simulated object store for the manifest-commit specs: a local FS
  * whose `rename` is DISABLED (object stores have no atomic rename —
  * s3a/gs emulate it as copy+delete). Registered under the
  * `nonatomic:` scheme via `fs.nonatomic.impl`; any protocol that
  * completes against it has proven it never needed the primitive.
  */
class NonAtomicTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("nonatomic:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean =
    throw new UnsupportedOperationException(
      "rename disabled: simulated object store")
}
