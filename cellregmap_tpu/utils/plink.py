"""PLINK 1.x dataset reader: native threaded .bed decode + bim/fam parsing.

The genotype IO layer for real eQTL scans: stream variant blocks from a
PLINK fileset straight into the scan drivers without materializing the full
genotype matrix.

    bed = PlinkReader("cohort")           # cohort.bed/.bim/.fam
    for block, rows in bed.iter_blocks(512):
        pv, info = crm.scan_interaction(block[donor_to_cell, :])
"""
from __future__ import annotations

import ctypes
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .native import _build_generic, _LOCK


_BED_LIB = None
_BED_TRIED = False


def _get_bed_lib():
    global _BED_LIB, _BED_TRIED
    with _LOCK:
        if _BED_TRIED:
            return _BED_LIB
        _BED_TRIED = True
        path = _build_generic("bedreader.cc", "libbed")
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
            lib.bed_decode_range.restype = ctypes.c_int
            lib.bed_decode_range.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
            ]
            _BED_LIB = lib
        except OSError:
            _BED_LIB = None
        return _BED_LIB


_LUT = np.array([2.0, np.nan, 1.0, 0.0])


def _decode_python(path, n_samples, v_start, v_end):
    """Pure-NumPy fallback decoder."""
    bpv = (n_samples + 3) // 4
    with open(path, "rb") as f:
        magic = f.read(3)
        if magic != b"\x6c\x1b\x01":
            raise ValueError("not a SNP-major PLINK .bed file")
        f.seek(3 + v_start * bpv)
        raw = np.frombuffer(f.read((v_end - v_start) * bpv), dtype=np.uint8)
    raw = raw.reshape(v_end - v_start, bpv)
    codes = np.empty((v_end - v_start, bpv * 4), dtype=np.uint8)
    for shift in range(4):
        codes[:, shift::4] = (raw >> (2 * shift)) & 0x3
    return _LUT[codes[:, :n_samples]].T.copy()


@dataclass
class PlinkVariant:
    chrom: str
    snp_id: str
    cm: float
    pos: int
    a1: str
    a2: str


class PlinkReader:
    """Reader for a PLINK 1.x fileset (prefix.bed / .bim / .fam)."""

    def __init__(self, prefix: str):
        self.prefix = str(prefix)
        self.bed_path = self.prefix + ".bed"
        self.samples = self._read_fam()
        self.variants = self._read_bim()
        self.n_samples = len(self.samples)
        self.n_variants = len(self.variants)
        if not Path(self.bed_path).exists():
            raise FileNotFoundError(self.bed_path)

    def _read_fam(self) -> List[Tuple[str, str]]:
        out = []
        with open(self.prefix + ".fam") as f:
            for line in f:
                parts = line.split()
                if parts:
                    out.append((parts[0], parts[1]))
        return out

    def _read_bim(self) -> List[PlinkVariant]:
        out = []
        with open(self.prefix + ".bim") as f:
            for line in f:
                p = line.split()
                if len(p) >= 6:
                    out.append(PlinkVariant(p[0], p[1], float(p[2]),
                                            int(p[3]), p[4], p[5]))
        return out

    def read(self, v_start: int = 0, v_end: Optional[int] = None,
             n_threads: int = 0) -> np.ndarray:
        """Decode variants [v_start, v_end) -> (n_samples, n) float64
        allele counts with NaN for missing."""
        v_end = self.n_variants if v_end is None else v_end
        lib = _get_bed_lib()
        if lib is None:
            return _decode_python(self.bed_path, self.n_samples, v_start,
                                  v_end)
        n = v_end - v_start
        out = np.empty((n, self.n_samples), dtype=np.float64)
        rc = lib.bed_decode_range(
            self.bed_path.encode(), self.n_samples, self.n_variants,
            v_start, v_end,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_threads,
        )
        if rc != 0:
            raise IOError(f"bed decode failed (rc={rc}) for {self.bed_path}")
        return out.T.copy()

    def iter_blocks(self, block_size: int = 512
                    ) -> Iterator[Tuple[np.ndarray, slice]]:
        """Stream (genotype block, variant slice) pairs."""
        for start in range(0, self.n_variants, block_size):
            end = min(start + block_size, self.n_variants)
            yield self.read(start, end), slice(start, end)


def write_bed(prefix: str, G: np.ndarray, snp_ids=None, sample_ids=None):
    """Write a (n_samples x n_variants) allele-count matrix as a PLINK
    fileset (testing/interop helper).  NaN -> missing."""
    G = np.asarray(G, float)
    n, m = G.shape
    inv = {2.0: 0, 1.0: 2, 0.0: 3}
    bpv = (n + 3) // 4
    with open(prefix + ".bed", "wb") as f:
        f.write(b"\x6c\x1b\x01")
        for v in range(m):
            buf = bytearray(bpv)
            for s in range(n):
                x = G[s, v]
                code = 1 if np.isnan(x) else inv[float(x)]
                buf[s // 4] |= code << (2 * (s % 4))
            f.write(bytes(buf))
    with open(prefix + ".bim", "w") as f:
        for v in range(m):
            sid = snp_ids[v] if snp_ids is not None else f"snp{v}"
            f.write(f"1\t{sid}\t0\t{v + 1}\tA\tC\n")
    with open(prefix + ".fam", "w") as f:
        for s in range(n):
            sid = sample_ids[s] if sample_ids is not None else f"iid{s}"
            f.write(f"fam{s}\t{sid}\t0\t0\t0\t-9\n")
