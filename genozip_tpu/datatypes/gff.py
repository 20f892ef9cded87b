"""GFF3/GTF/GVF datatype plugin (reference parity: src/gff.c)."""

from . import register
from .tabular import TabularDT


@register
class GffDT(TabularDT):
    NAME = "gff"
    FIELDS = [("SEQID", "dict"), ("SOURCE", "dict"), ("TYPE", "dict"),
              ("START", "num_delta"), ("END", "num_delta"), ("SCORE", "tok"),
              ("STRAND", "dict"), ("PHASE", "dict"), ("ATTRS", "tok1")]
    COMMENT_PREFIXES = (b"#", b">")  # '##FASTA' tail sections stay verbatim
