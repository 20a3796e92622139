# Packaging + dev targets for refimage_spark.
#
# `make zip` builds the --py-files artifact the CLI entrypoints expect:
#   spark-submit --py-files refimage_spark.zip scripts/build_index_cli.py ...

.PHONY: zip test bench clean

zip:
	rm -f refimage_spark.zip
	zip -r refimage_spark.zip refimage_spark -x '*/__pycache__/*' -x '*.pyc'

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f refimage_spark.zip
	find refimage_spark -name __pycache__ -type d -exec rm -rf {} +
