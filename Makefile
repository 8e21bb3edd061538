# Convenience targets (PYTHONPATH-free: run from the repo root)

.PHONY: test bench train-synthetic sweep verify-contracts

test:
	python -m pytest tests/ -q

bench:
	python bench.py

train-synthetic:
	python -m audiodepth_tpu.cli.train --dataset synthetic --model unet_baseline \
	    --epochs 5 --batch_size 32 --device_cache

sweep:
	python examples/family_sweep.py

verify-contracts:
	python -m audiodepth_tpu.tools.verify_contracts
