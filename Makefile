# avjepa_tpu build orchestration

.PHONY: all native test bench chain clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

# full real-media pipeline through the real CLIs (pretrain -> checkpoint
# roundtrip -> frozen eval + random-encoder control -> avprediction probe ->
# example PNG -> extract); flagship geometry — takes a real TPU chip.
chain: native
	python tools/run_chain.py --model vit_large --crop 224 --frames 16 \
		--batch 24 --clips 150 --clip-size 256 --ipe 50 --epochs 4 \
		--eval-epochs 300 --workers 4 --sticky --assert-learning \
		--out-json bench_artifacts/chain_flagship.json

# tiny CI-scale chain (vit_tiny, CPU-runnable): same six stages + the
# learning-gap assertion; regenerates the committed evidence artifact.
# tests/test_end_to_end_files.py gates a pytest wrapper on
# AVJEPA_RUN_CHAIN_CI=1 (it is a long test).
chain-ci: native
	python tools/run_chain.py --assert-learning \
		--workdir /tmp/avjepa_chain_ci \
		--out-json bench_artifacts/chain_ci.json

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache_cpu
