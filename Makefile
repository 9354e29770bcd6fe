# Mirror of the reference's makefile targets (reference: makefile:8-23),
# CLI-native. Pass overrides via ARGS, e.g.
#   make train ARGS="experiment=ml-1m-hstu-muon trainer.max_epochs=50"

PY ?= python
ARGS ?=

.PHONY: train eval predict prepare_data test bench smoke roundtrip

train:
	$(PY) -m mygenerativerecommenders_tpu.cli.train $(ARGS)

eval:
	$(PY) -m mygenerativerecommenders_tpu.cli.eval $(ARGS)

predict:
	$(PY) -m mygenerativerecommenders_tpu.cli.predict $(ARGS)

prepare_data:
	$(PY) -m mygenerativerecommenders_tpu.cli.prepare_data $(ARGS)

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

smoke:
	$(PY) -m mygenerativerecommenders_tpu.cli.train experiment=synthetic-smoke \
		trainer.fast_dev_run=true $(ARGS)

# Full reference-checkpoint round-trip: train the genuine reference
# torch modules, convert their best checkpoint via cli/convert_ckpt,
# eval with OUR trainer, and print per-metric deltas (expected 0.0).
# ARGS: "<epochs> <users> <seed>" (defaults 30 384 42).
roundtrip:
	$(PY) benchmarks/reference_e2e.py roundtrip $(ARGS)
