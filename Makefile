# Convenience targets for cluster_generator_tpu

.PHONY: test test-fast bench native answers clean

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

native:
	$(MAKE) -C native

# regenerate the committed golden answers (after an intentional
# algorithm change)
answers: native
	python -m pytest tests/test_answers.py -q --answer_dir=tests/answers --answer_store

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache cluster_generator_tpu/**/__pycache__ tests/__pycache__
