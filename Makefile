.PHONY: test bench train explain dryrun docs native

test:
	python -m pytest tests/ -q

native:
	python -c "from isubgvqa_tpu.native import load_collate_lib; \
	  lib = load_collate_lib(); \
	  print('native collate:', 'ok' if lib else 'UNAVAILABLE')"

bench:
	python bench.py

train:
	bash scripts/run_training.sh imle 2 256

explain:
	python run_token_coo.py --ckpt outputdir/checkpoint_top_res

dryrun:
	python __graft_entry__.py

docs:
	sphinx-build -W -b html docs docs/_build/html
