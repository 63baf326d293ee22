# Convenience targets. Tests force the CPU backend with a simulated
# 8-device mesh (tests/conftest.py); bench targets whatever jax.devices()
# exposes (the axon TPU when the tunnel is up, CPU otherwise).

.PHONY: test test-fast bench scaling configs native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/unit tests/integration -q

bench:
	python bench.py

scaling:
	python -m maxwell_tpu.bench.scaling --mode weak

configs:
	for c in configs/config*.json; do \
	  echo "== $$c"; python -m maxwell_tpu.cli.run $$c | tail -1; done

native:
	python -c "from maxwell_tpu import native; print('HAVE_NATIVE =', native.HAVE_NATIVE)"
