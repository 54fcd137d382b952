#!/usr/bin/env python3
"""Deterministic 10x scale-up of the driver's sf0.1 fixture -> target/sf1.

The driver generates parquet fixtures only up to sf0.1; the round-7
verdict asked for the correctness ladder to be certified one decade up.
This builds an sf1-shaped fixture by concatenating 10 KEY-OFFSET copies
of sf0.1 (pyarrow, schemas preserved bit-for-bit):

- region/nation are fixed dimensions: straight copies;
- every key column shifts by copy_index * stride, with strides chosen so
  the copies' key spaces are disjoint AND the query contracts'
  disjointness envelope holds (customer ids stay < 1e6, so the trade
  graph's +1e6 supplier offset remains collision-free);
- non-key values (text, amounts, dates, embeddings) are identical across
  copies -- deliberately: exact-duplicate explosion at 10x is the
  adversarial case for the dedup/LSH/closure families, and referential
  joins stay consistent within each copy.

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=target/sf1]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10
STRIDE = {'o_orderkey': 1_000_000, 'l_orderkey': 1_000_000,
          'c_custkey': 100_000, 'o_custkey': 100_000, 'user_id': 100_000,
          's_suppkey': 10_000, 'l_suppkey': 10_000,
          'p_partkey': 100_000, 'l_partkey': 100_000,
          'event_id': 1_000_000, 'doc_id': 10_000, 'vec_id': 10_000}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    dst = sys.argv[2] if len(sys.argv) > 2 else 'target/sf1'
    os.makedirs(dst, exist_ok=True)
    for t in ['region', 'nation']:
        shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
    for t in ['customer', 'supplier', 'part', 'orders', 'lineitem',
              'events', 'documents', 'embeddings']:
        tab = pq.read_table(f'{src}/{t}.parquet')
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
