"""External input bridges: CRAM/BCF/ORA via child processes, URLs via
curl/wget.

Reference parity: src/stream.c:248 stream_create + src/file.c:39-40,560,660
(CRAM crosses a pipe to `samtools view`, BCF to `bcftools view`, .ora to
`orad`) and src/url.c:36-82 (remote inputs via curl/wget). The bridges are
feature-gated on tool availability — this image has zero egress and ships
none of the tools, so each raises a clear error when the tool is absent;
the plumbing itself is exercised by tests with PATH shims."""

import io
import shutil
import subprocess


class _PipeReader(io.RawIOBase):
    """File-like over a child process stdout; reaps the child on close."""

    def __init__(self, proc):
        self.proc = proc
        self.raw = proc.stdout

    def read(self, n=-1):
        return self.raw.read(n)

    def close(self):
        try:
            self.raw.close()
        finally:
            rc = self.proc.wait()
            assert rc == 0, f"external decoder exited with {rc}"


def _spawn(argv):
    return _PipeReader(subprocess.Popen(
        argv, stdout=subprocess.PIPE, stdin=subprocess.DEVNULL))


def external_reader(path: str):
    """Returns (file-like of decoded text, datatype hint) for inputs that
    need an external decoder; None if `path` is not such an input."""
    if path.endswith(".cram"):
        tool = shutil.which("samtools")
        assert tool, ("CRAM input needs `samtools` on PATH "
                      "(reference bridges CRAM the same way, file.c:560)")
        return _spawn([tool, "view", "-h", path]), "sam"
    if path.endswith(".bcf"):
        tool = shutil.which("bcftools")
        assert tool, ("BCF input needs `bcftools` on PATH "
                      "(reference parity file.c:660)")
        return _spawn([tool, "view", path]), "vcf"
    if path.endswith(".ora"):
        tool = shutil.which("orad")
        assert tool, ".ora input needs DRAGEN `orad` on PATH"
        return _spawn([tool, "--raw", "--stdout", path]), "fastq"
    return None


def url_reader(url: str):
    """Streaming remote input (reference src/url.c via curl/wget)."""
    if shutil.which("curl"):
        return _spawn(["curl", "-fsSL", url])
    if shutil.which("wget"):
        return _spawn(["wget", "-qO-", url])
    raise AssertionError("URL input needs curl or wget on PATH "
                         "(reference url.c:36-82; this image has no egress)")
