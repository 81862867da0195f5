#!/bin/bash
# Round-4 TPU measurement queue — run ONLY when no other TPU process is
# alive (the axon tunnel is single-client; a second client corrupts
# in-flight state).  Each step is its own process, run strictly
# sequentially.
set -x
cd /root/repo

python bench.py > BENCH_r04_raw.json 2> bench_r04.log
timeout 3600 python bench_ablate.py 2> ablate_r04.log
timeout 1800 python bench_halo_overhead.py --dtype float32 \
  --volume 4194304 --out HALO_OVERHEAD_tpu.json 2> halo_tpu_r04.log
timeout 1800 python bench_support_repr.py 2> support_repr_r04.log
KFS_BENCH_TIMEOUT_S=2400 timeout 7200 python bench_e2e.py toggle \
  > bench_e2e_r04.jsonl 2> bench_e2e_r04.log
echo DONE_ALL
