// Native benchmark CLI over the golden model.
//
// Mirrors the reference benchmark's report format (cpuTiming printfs,
// cudaBenchMarking.cpp:328-331) but takes the capture path as argv[1]
// instead of hardcoding it (the reference hardcodes "./fhy_direct.bin",
// cudaBenchMarking.cpp:224).
//
// Usage: radar_bench <capture.bin> [max_frames]

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "golden.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <capture.bin> [max_frames]\n", argv[0]);
    return 2;
  }
  const char* path = argv[1];
  const int max_frames = argc > 2 ? std::atoi(argv[2]) : -1;

  RadarParams p;
  radar_default_params(&p);

  // pass the buffer capacity as the frame cap so the capture loop can
  // never write past the allocation
  const int cap = max_frames > 0 ? max_frames : 1 << 20;
  std::vector<double> distances(cap);
  double t[4] = {0, 0, 0, 0};
  std::printf("CPU Timing (native golden model)\n");
  const int n = radar_process_capture(&p, path, t, distances.data(), cap);
  if (n < 0) {
    std::fprintf(stderr, "unable to read the specified file: %s\n", path);
    return 1;
  }
  std::printf("Total Time for %d frames %.5f ms averaged %.5f FPS \n", n,
              1000.0 * t[0], n / t[0]);
  std::printf("Total FFT time %.5f ms averaged %.5f ms/frame \n",
              1000.0 * t[1], 1000.0 * t[1] / n);
  std::printf("Total Reshape + Extension time %.5f ms averaged %.5f / frame\n",
              1000.0 * t[2], 1000.0 * t[2] / n);
  std::printf("Total findMax time %.5f ms averaged %.5f ms/frame\n",
              1000.0 * t[3], 1000.0 * t[3] / n);
  for (int i = 0; i < n && i < 5; ++i) {
    std::printf("frame[%d] distance %.6f m\n", i + 1, distances[i]);
  }
  return 0;
}
