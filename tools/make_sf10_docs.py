#!/usr/bin/env python3
"""Second decade up, document families only: sf0.1 -> target/sf10.

make_sf1.py certifies one decade above the bench scale across the whole
surface. A full sf10 is NOT buildable under the current id envelope --
100 key-offset copies would push c_custkey past the trade graph's
1e6 supplier offset -- and the families whose scale behavior is still
an open question two decades up are the document/embedding ones anyway
(closures, banded dedup, BPE, ANN). So this builds:

- documents, embeddings: 100 key-offset copies (doc_id/vec_id stride
  10_000 -- ids stay < 1.02e6, no cross-table constraint exists);
- every other table: straight sf0.1 copy, so graft.Tables loads them
  and non-document queries simply aren't part of the sf10 subset.

The 100-copy duplicate explosion is deliberately adversarial for the
dedup families, with one emergent regime shift worth knowing when
reading results: a winnow/minhash fingerprint shared by k base docs
appears 100k times at sf10, so the shared-fp frequency caps
(maxDocsPerFp=100) now drop every fingerprint that was shared across
base docs at sf0.1 and keep exactly the single-base-doc ones (100
copies = at the cap). Candidate graphs therefore collapse toward pure
copy-groups -- the cap doing its 100 TB job, visible in the numbers.

Usage: python3 tools/make_sf10_docs.py [src=/root/testdata/sf0.1] [dst=target/sf10]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 100
STRIDE = {'doc_id': 10_000, 'vec_id': 10_000}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    dst = sys.argv[2] if len(sys.argv) > 2 else 'target/sf10'
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
        pieces = []
        for i in range(COPIES):
            cols = []
            for name in tab.column_names:
                col = tab[name]
                if name in STRIDE and i > 0:
                    col = pc.add(col, pa.scalar(i * STRIDE[name],
                                                type=col.type))
                cols.append(col)
            pieces.append(pa.table(cols, names=tab.column_names))
        out = pa.concat_tables(pieces)
        pq.write_table(out, f'{dst}/{t}.parquet')
        print(t, out.num_rows)


if __name__ == '__main__':
    main()
