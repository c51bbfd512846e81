.PHONY: native test lint bench clean

native:
	python csrc/setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

lint:
	flake8 whisperlive_tpu tests --max-line-length=100 --extend-ignore=E203,E501,W503

bench:
	python bench.py

clean:
	rm -rf build dist *.egg-info wl_native*.so
