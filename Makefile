# Developer entry points (the reference Makefile is echo-stubs; these run).

PY ?= python

.PHONY: all native test bench lint proto docker clean

all: native proto

native:
	$(MAKE) -C native

proto:
	protoc --python_out=sentiric_stt_whisper_service_tpu/serving/proto \
	    -I sentiric_stt_whisper_service_tpu/serving/proto \
	    sentiric_stt_whisper_service_tpu/serving/proto/stt.proto

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

serve:
	$(PY) -m sentiric_stt_whisper_service_tpu.serving

docker:
	docker build -t sentiric-stt-whisper-service-tpu:latest .

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
