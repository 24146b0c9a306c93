// TSan smoke test: concurrent producers into separate stream buffers +
// a shared parse path. Run via `make -C native tsan`.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* sstw_rb_create();
void sstw_rb_destroy(void*);
size_t sstw_rb_append(void*, const uint8_t*, size_t);
size_t sstw_rb_size(void*);
void sstw_rb_read(void*, int16_t*);
void sstw_rb_clear(void*);
}

int main() {
  std::vector<std::thread> threads;
  for (int t = 0; t < 4; ++t) {
    threads.emplace_back([t] {
      void* rb = sstw_rb_create();
      uint8_t chunk[320];
      std::memset(chunk, t, sizeof(chunk));
      for (int i = 0; i < 1000; ++i) sstw_rb_append(rb, chunk, sizeof(chunk));
      std::vector<int16_t> out(sstw_rb_size(rb));
      sstw_rb_read(rb, out.data());
      if (out.size() != 1000 * 160) {
        std::fprintf(stderr, "size mismatch\n");
        return;
      }
      sstw_rb_destroy(rb);
    });
  }
  for (auto& th : threads) th.join();
  std::puts("tsan smoke OK");
  return 0;
}
