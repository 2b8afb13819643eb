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
# roundtrip -> frozen eval -> avprediction probe -> example PNG); flagship
# geometry — takes a real TPU chip. See tools/run_chain.py for the tiny
# CI-scale variant (its defaults).
chain: native
	python tools/run_chain.py --model vit_large --crop 224 --frames 16 \
		--batch 24 --clips 150 --clip-size 256 --ipe 50 --epochs 6 \
		--eval-epochs 10 --workers 4

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache_cpu
