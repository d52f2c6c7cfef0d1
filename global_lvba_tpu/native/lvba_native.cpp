// Native host runtime for global_lvba_tpu: the C-side of the data loader
// and track-graph builder.  The reference's equivalents are PCL's PCD
// reader (+LZF), std::unordered_map voxel binning and the BFS track builder
// (/root/reference/src/dataset_io.cpp:263-288, src/lvba_system.cpp:965-986);
// here they are plain C functions exposed through ctypes, feeding numpy.
//
// Build: g++ -O3 -march=native -shared -fPIC lvba_native.cpp -o liblvba_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// LZF decompression (PCL binary_compressed payload layout).
// Returns bytes written, or -1 on malformed input.
long lvba_lzf_decompress(const unsigned char* in, long in_len,
                         unsigned char* out, long out_len) {
  long ip = 0, op = 0;
  while (ip < in_len && op < out_len) {
    unsigned int ctrl = in[ip++];
    if (ctrl < 32) {  // literal run
      long cnt = (long)ctrl + 1;
      if (ip + cnt > in_len || op + cnt > out_len) return -1;
      std::memcpy(out + op, in + ip, cnt);
      ip += cnt;
      op += cnt;
    } else {  // back reference
      long len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return -1;
        len += in[ip++];
      }
      if (ip >= in_len) return -1;
      long ref = op - (((long)(ctrl & 0x1f)) << 8) - (long)in[ip++] - 1;
      if (ref < 0) return -1;
      len += 2;
      if (op + len > out_len) return -1;
      for (long i = 0; i < len; ++i) out[op + i] = out[ref + i];
      op += len;
    }
  }
  return op;
}

// ---------------------------------------------------------------------------
// Voxel key computation: floor(p / voxel) packed into int64 (21 bits/axis,
// offset 2^20) — matches map/voxelize.pack_voxel_keys.
int lvba_voxel_keys(const float* pts, long n, double voxel_size,
                    long long* keys_out) {
  const long long OFF = 1LL << 19;
  const long long LIM = 1LL << 20;
  for (long i = 0; i < n; ++i) {
    long long k = 0;
    for (int j = 0; j < 3; ++j) {
      double v = (double)pts[i * 3 + j] / voxel_size;
      long long c = (long long)std::floor(v) + OFF;
      if (c < 0 || c >= LIM) return -1;
      k = (k << 20) | c;
    }
    keys_out[i] = k;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// 8-pass LSD radix sort of int64 keys; fills the permutation (argsort).
void lvba_radix_argsort(const long long* keys, long n, long long* perm_out) {
  std::vector<long long> idx(n), tmp_idx(n);
  std::vector<unsigned long long> k(n), tmp_k(n);
  for (long i = 0; i < n; ++i) {
    idx[i] = i;
    k[i] = (unsigned long long)keys[i] ^ 0x8000000000000000ULL;
  }
  long cnt[256];
  for (int pass = 0; pass < 8; ++pass) {
    int shift = pass * 8;
    std::memset(cnt, 0, sizeof(cnt));
    for (long i = 0; i < n; ++i) cnt[(k[i] >> shift) & 0xff]++;
    long sum = 0;
    for (int b = 0; b < 256; ++b) {
      long c = cnt[b];
      cnt[b] = sum;
      sum += c;
    }
    for (long i = 0; i < n; ++i) {
      int b = (k[i] >> shift) & 0xff;
      tmp_k[cnt[b]] = k[i];
      tmp_idx[cnt[b]] = idx[i];
      cnt[b]++;
    }
    k.swap(tmp_k);
    idx.swap(tmp_idx);
  }
  std::memcpy(perm_out, idx.data(), n * sizeof(long long));
}

// ---------------------------------------------------------------------------
// Union-find over match edges; labels each node with its component root.
// nodes: 0..n-1; edges: (2, m) int64 pairs. Path halving + union by size.
void lvba_union_find(long n, const long long* edges_a, const long long* edges_b,
                     long m, long long* label_out) {
  std::vector<long long> parent(n);
  std::vector<long long> size(n, 1);
  for (long i = 0; i < n; ++i) parent[i] = i;
  auto find = [&](long long x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  for (long e = 0; e < m; ++e) {
    long long ra = find(edges_a[e]);
    long long rb = find(edges_b[e]);
    if (ra == rb) continue;
    if (size[ra] < size[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    size[ra] += size[rb];
  }
  for (long i = 0; i < n; ++i) label_out[i] = find(i);
}

}  // extern "C"
