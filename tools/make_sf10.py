#!/usr/bin/env python3
"""Full-table second decade: sf0.1 -> target/sf10full, every table.

make_sf10_docs.py scales only documents/embeddings because the trade
graph's old 1e6 supplier node offset capped the customer key space; the
engine now offsets supplier nodes by 1e9 (SparkEntry.SupplierNodeOffset),
so 100 key-offset copies of the RELATIONAL tables fit too: custkeys
reach ~1.5e6 + 99*1e5 ~ 1e7, two decades under the offset.

Same construction as make_sf1.py (key columns shift by
copy_index * stride, non-key values identical across copies — the
adversarial exact-duplicate regime), but STREAMED: each copy is written
as its own parquet row group, so the 60M-row lineitem never sits in
memory at once. Strides are asserted against the base maxima — an
overlapping copy would silently alias keys and corrupt every
certification built on the fixture.

The copy count is a parameter so the same generator produces the
THIRD full-table decade (copies=1000 -> target/sf100full, 600M
lineitem / 150M orders / 15M customers, ~17 GB parquet). Key head-room
at 1000 copies: custkeys reach 1.5e6 + 999*1e5 ~ 1.01e8, still one
decade under the 1e9 supplier node offset; suppkeys reach ~1e7.

Usage: python3 tools/make_sf10.py [src=/root/testdata/sf0.1] [dst=target/sf10full] [copies=100]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 100
STRIDE = {'o_orderkey': 1_000_000, 'l_orderkey': 1_000_000,
          'c_custkey': 100_000, 'o_custkey': 100_000, 'user_id': 100_000,
          's_suppkey': 10_000, 'l_suppkey': 10_000,
          'p_partkey': 100_000, 'l_partkey': 100_000,
          'event_id': 1_000_000, 'doc_id': 10_000, 'vec_id': 10_000}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    dst = sys.argv[2] if len(sys.argv) > 2 else 'target/sf10full'
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else COPIES
    os.makedirs(dst, exist_ok=True)
    for t in ['region', 'nation']:
        shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
        print(t, '(fixed dimension, straight copy)')
    for t in ['customer', 'supplier', 'part', 'orders', 'lineitem',
              'events', 'documents', 'embeddings']:
        tab = pq.read_table(f'{src}/{t}.parquet')
        for name in tab.column_names:
            if name in STRIDE:
                mx = pc.max(tab[name]).as_py()
                assert mx < STRIDE[name], (
                    f'{t}.{name} max {mx} >= stride {STRIDE[name]}: '
                    f'offset copies would overlap — raise STRIDE')
        writer = pq.ParquetWriter(f'{dst}/{t}.parquet', tab.schema)
        n = 0
        for i in range(copies):
            cols = []
            for name in tab.column_names:
                col = tab[name]
                if name in STRIDE and i > 0:
                    col = pc.add(col, pa.scalar(i * STRIDE[name],
                                                type=col.type))
                cols.append(col)
            piece = pa.table(cols, names=tab.column_names)
            writer.write_table(piece)
            n += piece.num_rows
        writer.close()
        print(t, n)


if __name__ == '__main__':
    main()
