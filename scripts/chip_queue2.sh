#!/bin/bash
# Round-5 chip queue 2: tile-size table, packed stage profile, strategy
# recalibration + 2DGS rerun.  Serialized — the axon tunnel wedges under
# concurrent clients (see memory: axon-tunnel-fragility).
cd /root/repo
PK="GSPLAT_TPU_PACK_SORT=1 GSPLAT_TPU_PACK_GRADS=1"

echo "=== bench ts=32 both-pack ==="
env GSPLAT_TPU_PACK_SORT=1 GSPLAT_TPU_PACK_GRADS=1 GSPLAT_TPU_BENCH_TILE=32 \
    timeout 2400 python bench.py 2>/dev/null

echo "=== bench ts=32 no-pack ==="
env GSPLAT_TPU_BENCH_TILE=32 GSPLAT_TPU_PACK_SORT=0 GSPLAT_TPU_PACK_GRADS=0 \
    timeout 2400 python bench.py 2>/dev/null

echo "=== stage profile (packed) ==="
env GSPLAT_TPU_PACK_SORT=1 GSPLAT_TPU_PACK_GRADS=1 \
    timeout 3600 python scripts/profile_stages.py 2>/dev/null

echo "=== default-strategy grad2d diagnostic (400 steps, saves state) ==="
env GSPLAT_TPU_PACK_SORT=1 GSPLAT_TPU_PACK_GRADS=1 \
    timeout 3600 python examples/simple_trainer.py default --data npz \
    --npz_traj_views 32 --npz_subsample 4 --max_steps 400 \
    --eval_every 100000 --save_every 400 \
    --result_dir results/r5_grad2d_diag 2>/dev/null | tail -5

echo "=== 2DGS rerun with fixes (2k steps, 12M cap) ==="
env GSPLAT_TPU_PACK_SORT=1 GSPLAT_TPU_PACK_GRADS=1 \
    timeout 5400 python examples/simple_trainer_2dgs.py --data npz \
    --npz_traj_views 32 --npz_subsample 4 --max_steps 2000 \
    --eval_every 500 --isect_capacity 12582912 \
    --result_dir results/r5_2dgs_fixed 2>/dev/null | grep -E "step |eval|WARNING" | tail -30

echo DONE
