"""gRPC test client: ``stt_cli <file|stream> <wav> [addr]``.

Port of /root/reference/src/cli/: ``file`` mode reads the WAV body
(skipping the 44-byte header), one unary call, prints
text/lang/prob/duration (audio_client.cpp:91-139); ``stream`` mode sends
0.5 s chunks on a 500 ms cadence simulating real time, then an empty EOS
chunk, and drains responses (:141-189).
"""

from __future__ import annotations

import sys
import time

import grpc

from ..serving.proto import stt_pb2

_SERVICE = "sentiric.stt.v1.SttWhisperService"
_METADATA = (
    ("x-tenant-id", "cli-test"),
    ("x-trace-id", "cli-trace"),
    ("x-span-id", "cli-span"),
)


def _unary(channel, wav_bytes: bytes):
    call = channel.unary_unary(
        f"/{_SERVICE}/WhisperTranscribe",
        request_serializer=stt_pb2.WhisperTranscribeRequest.SerializeToString,
        response_deserializer=stt_pb2.WhisperTranscribeResponse.FromString,
    )
    req = stt_pb2.WhisperTranscribeRequest(audio_data=wav_bytes)
    resp = call(req, metadata=_METADATA, timeout=600)
    print(f"Transcription : {resp.transcription!r}")
    print(f"Language      : {resp.language} (p={resp.language_probability:.3f})")
    print(f"Duration      : {resp.duration:.2f}s")
    print(f"Speaker       : {resp.speaker_id} gender={resp.gender_proxy} "
          f"emotion={resp.emotion_proxy}")
    if resp.words:
        print("Words:")
        for w in resp.words:
            print(f"  [{w.start:6.2f}-{w.end:6.2f}] p={w.probability:.2f} {w.word!r}")


def _stream(channel, wav_bytes: bytes):
    call = channel.stream_stream(
        f"/{_SERVICE}/WhisperTranscribeStream",
        request_serializer=stt_pb2.WhisperTranscribeStreamRequest.SerializeToString,
        response_deserializer=stt_pb2.WhisperTranscribeStreamResponse.FromString,
    )
    body = wav_bytes[44:] if wav_bytes[:4] == b"RIFF" else wav_bytes
    chunk_bytes = 16000  # 0.5 s of PCM16 @ 16 kHz

    def requests():
        for i in range(0, len(body), chunk_bytes):
            yield stt_pb2.WhisperTranscribeStreamRequest(
                audio_chunk=body[i : i + chunk_bytes]
            )
            time.sleep(0.5)  # simulate real-time capture
        yield stt_pb2.WhisperTranscribeStreamRequest(audio_chunk=b"")  # EOS

    for resp in call(requests(), metadata=_METADATA):
        kind = "FINAL  " if resp.is_final else "partial"
        print(f"[{kind}] {resp.transcription!r} (spk={resp.speaker_id})")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[0] not in ("file", "stream"):
        print("usage: stt_cli <file|stream> <wav> [addr]", file=sys.stderr)
        return 2
    mode, path = argv[0], argv[1]
    addr = argv[2] if len(argv) > 2 else "localhost:15031"
    with open(path, "rb") as f:
        wav_bytes = f.read()
    channel = grpc.insecure_channel(addr)
    try:
        if mode == "file":
            _unary(channel, wav_bytes)
        else:
            _stream(channel, wav_bytes)
    except grpc.RpcError as e:
        print(f"RPC failed: {e.code().name}: {e.details()}", file=sys.stderr)
        return 1
    finally:
        channel.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
