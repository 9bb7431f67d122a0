# Convenience targets for cluster_generator_tpu

.PHONY: test test-fast bench bench-all native answers ref-answers clean

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

# all five BASELINE.md configs: the headline (bench.py, config 4) plus
# configs 1-3, 5 and the 512^3 field (vs measured reference CPU baselines)
bench-all: bench
	python benchmarks/bench_configs.py all

# regenerate the reference-package goldens + measured CPU baselines
ref-answers:
	python scripts/generate_reference_answers.py
	python benchmarks/measure_reference_extra.py

native:
	$(MAKE) -C native

# regenerate the committed golden answers (after an intentional
# algorithm change)
answers: native
	python -m pytest tests/test_answers.py -q --answer_dir=tests/answers --answer_store

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache cluster_generator_tpu/**/__pycache__ tests/__pycache__
