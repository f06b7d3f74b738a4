"""BAM recalibration path (SURVEY.md §4.2; BASELINE config 3).

Same 4-pass pipeline as FASTQ; differences handled at the IO boundary:
machine-order re-orientation, RG-tag read groups, --use-oq / --set-oq,
secondary/supplementary records passed through untouched.
"""

from __future__ import annotations

import sys

import numpy as np

from ..io.bam import (
    machine_order_read,
    read_bam,
    rewrite_quals,
    serialize_bam,
)
from ..io.batcher import ReadArrays
from .recalibrate import RecalConfig


def bam_read_group_ids(bf, records):
    """Dense RG index per record (registry order = first appearance);
    records without an RG tag share group 0 of a default registry."""
    registry: dict[str, int] = {}
    rgs = np.zeros(len(records), dtype=np.int32)
    for i, rec in enumerate(records):
        tag = rec.get_zstr("RG")
        key = tag.decode() if tag is not None else ""
        if key not in registry:
            registry[key] = len(registry)
        rgs[i] = registry[key]
    return rgs, registry


def recalibrate_bam(in_path: str, out_path, config: RecalConfig,
                    use_oq: bool = False, set_oq: bool = False,
                    checkpoint_dir: str | None = None,
                    devices: int | None = None,
                    bloom_layout: str = "auto") -> dict:
    from .recalibrate import run_pipeline

    # SAM text and BAM share one record model (htslib sam_read1 duality,
    # SURVEY.md C7); the serializer matches the input format
    is_sam = str(in_path).endswith((".sam", ".sam.gz"))
    if is_sam:
        from ..io.sam import read_sam
        bf = read_sam(in_path)
    else:
        bf = read_bam(in_path)
    primary = [r for r in bf.records
               if not r.is_secondary_or_supp and r.l_seq > 0]

    codes_list, quals_list, seconds = [], [], []
    for rec in primary:
        c, q = machine_order_read(rec, use_oq=use_oq)
        codes_list.append(c)
        quals_list.append(np.clip(q, 0, 93).astype(np.int8))
        seconds.append(rec.is_read2)
    rgs, registry = bam_read_group_ids(bf, primary)
    max_len = max((len(c) for c in codes_list), default=1)
    arrays = ReadArrays.from_lists(codes_list, quals_list, rgs, seconds,
                                   max_len=max_len)
    new_quals = run_pipeline(arrays, config, checkpoint_dir=checkpoint_dir,
                             devices=devices, bloom_layout=bloom_layout)

    total_bases = 0
    for i, rec in enumerate(primary):
        L = len(codes_list[i])
        total_bases += L
        rewrite_quals(rec, new_quals[i][:L], set_oq=set_oq)

    if is_sam:
        from ..io.sam import serialize_sam
        data = serialize_sam(bf)
    else:
        data = serialize_bam(bf, compress=True)
    if isinstance(out_path, (str, bytes)):
        with open(out_path, "wb") as f:
            f.write(data)
    else:
        out_path.write(data)
    return {"num_reads": len(primary), "total_bases": total_bases,
            "read_groups": len(registry)}
