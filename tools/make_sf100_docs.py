#!/usr/bin/env python3
"""Third decade up, document families only: sf0.1 -> target/sf100.

Same construction as make_sf10_docs.py (key-offset copies, non-key
values identical across copies) at 1000 copies: 5M documents / 2M
embeddings, doc_id/vec_id stride 10_000 so ids stay < 1.001e7. Streamed
like make_sf10.py — each copy lands as its own parquet row group, so the
5M-row document table never sits in memory at once.

Regime note (deliberate, visible in the numbers): at 1000-copy
multiplicity the shipped near-dup queries' shared-fingerprint caps
(maxDocsPerFp = 100/1000) drop EVERY winnow/minhash fingerprint — every
content group sits above the cap — so the banded candidate graphs are
empty by contract and the near-dup family is exercised at sf100 only
through its cap arithmetic, not its pair semantics. The sf100 gate
therefore certifies the families whose semantics survive the
multiplicity: map-grain text analysis, exact (uncapped) fingerprint
dedup, BPE (the word table is copy-invariant; counts scale x1000), and
the ANN index family.

Usage: python3 tools/make_sf100_docs.py [src=/root/testdata/sf0.1] [dst=target/sf100]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 1000
STRIDE = {'doc_id': 10_000, 'vec_id': 10_000}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    dst = sys.argv[2] if len(sys.argv) > 2 else 'target/sf100'
    os.makedirs(dst, exist_ok=True)
    for t in ['region', 'nation', 'customer', 'supplier', 'part',
              'orders', 'lineitem', 'events']:
        shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
        print(t, '(straight copy)')
    for t in ['documents', 'embeddings']:
        tab = pq.read_table(f'{src}/{t}.parquet')
        # offset copies are disjoint ONLY while base ids stay below the
        # stride; a grown fixture would otherwise silently alias ids
        # across copies and corrupt every dedup/closure certification
        for name in tab.column_names:
            if name in STRIDE:
                mx = pc.max(tab[name]).as_py()
                assert mx < STRIDE[name], (
                    f'{t}.{name} max {mx} >= stride {STRIDE[name]}: '
                    f'offset copies would overlap — raise STRIDE')
        writer = pq.ParquetWriter(f'{dst}/{t}.parquet', tab.schema)
        rows = 0
        for i in range(COPIES):
            cols = []
            for name in tab.column_names:
                col = tab[name]
                if name in STRIDE and i > 0:
                    col = pc.add(col, pa.scalar(i * STRIDE[name],
                                                type=col.type))
                cols.append(col)
            piece = pa.table(cols, names=tab.column_names)
            writer.write_table(piece)
            rows += piece.num_rows
        writer.close()
        print(t, rows)


if __name__ == '__main__':
    main()
