// Standalone sanitizer/robustness harness for the native core.
//
// Builds the compiler without Python (-DVCF2PROT_NO_PYTHON) so the whole
// parse -> decode -> compile -> fuse path runs under ASan/UBSan natively:
//
//   g++ -O1 -g -fsanitize=address,undefined -DVCF2PROT_NO_PYTHON \
//       -std=c++17 native/test_harness.cpp -o /tmp/vcf2prot_harness
//   /tmp/vcf2prot_harness <cohort.vcf> <proteome.fasta>     # one cohort
//   /tmp/vcf2prot_harness --fuzz <seed> <iters>             # garbage sweep
//
// tests/test_native_robustness.py invokes this under both sanitizers.
#include "vcf2prot_native.cpp"

#include <cstdio>
#include <fstream>
#include <random>

using namespace std;

static string read_file(const char* path) {
  ifstream in(path, ios::binary);
  return string(istreambuf_iterator<char>(in), istreambuf_iterator<char>());
}

static void load_fasta(const string& text, vector<string>* names,
                       vector<int64_t>* offsets) {
  offsets->push_back(0);
  size_t pos = 0;
  string cur;
  while (pos < text.size()) {
    size_t nl = text.find('\n', pos);
    string_view line(text.data() + pos,
                     (nl == string::npos ? text.size() : nl) - pos);
    pos = nl == string::npos ? text.size() : nl + 1;
    if (line.empty()) continue;
    if (line[0] == '>') {
      if (!names->empty()) offsets->push_back(offsets->back() + (int64_t)cur.size());
      names->emplace_back(line.substr(1));
      cur.clear();
    } else {
      cur.append(line);
    }
  }
  if (!names->empty()) offsets->push_back(offsets->back() + (int64_t)cur.size());
}

static int run_cohort(const char* vcf, const char* fasta) {
  string vcf_text = read_file(vcf);
  string fa = read_file(fasta);
  vector<string> names;
  vector<int64_t> offsets;
  load_fasta(fa, &names, &offsets);
  QcFlags qc;
  qc.inspect_ins_gen = qc.inspect_txp = false;
  qc.panic_on_err = false;
  CohortResult r = compile_cohort_impl(vcf_text, names, offsets, qc, 2, true);
  size_t tasks = 0, res = 0;
  for (auto& h : r.haps) {
    tasks += h.exe.size();
    res += (size_t)h.res_len;
  }
  // forced pool mode exercises the lazy-grouping + parse/pointer-memo
  // paths (round 4) under the sanitizers regardless of cohort sharing;
  // both modes must agree on total task/result sizes
  CohortResult rp =
      compile_cohort_impl(vcf_text, names, offsets, qc, 2, false, 1);
  size_t tasks_p = 0, res_p = 0;
  for (auto& h : rp.haps) {
    tasks_p += h.exe.size();
    res_p += (size_t)h.res_len;
  }
  if (tasks_p != tasks || res_p != res) {
    fprintf(stderr, "pool-mode size mismatch: %zu/%zu vs %zu/%zu\n",
            tasks_p, res_p, tasks, res);
    return 1;
  }
  printf("cohort ok: %zu samples, %zu tasks, %zu result bytes, %zu warnings\n",
         r.probands.size(), tasks, res, r.warnings.size());
  return 0;
}

static int run_fuzz(unsigned seed, int iters) {
  mt19937 rng(seed);
  const string printable =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789|,;:>*&\t.";
  vector<string> names = {"T1"};
  vector<int64_t> offsets = {0, 101};
  QcFlags qc;
  qc.inspect_ins_gen = qc.inspect_txp = qc.panic_on_err = false;
  int clean_errors = 0;
  for (int i = 0; i < iters; ++i) {
    string text = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n";
    int lines = (int)(rng() % 8) + 1;
    for (int l = 0; l < lines; ++l) {
      int len = (int)(rng() % 300) + 1;
      for (int c = 0; c < len; ++c)
        text.push_back(printable[rng() % printable.size()]);
      text.push_back('\n');
    }
    text +=
        "1\t2\tv\tA\tT\t9\tPASS\t"
        "BCSQ=missense|G|T1|protein_coding|+|5C>5K|1A>1T\tGT:BCSQ\t0|1:1\n";
    try {
      compile_cohort_impl(text, names, offsets, qc, 1, false);
    } catch (const std::exception&) {
      ++clean_errors;
    }
  }
  printf("fuzz ok: %d iterations, %d clean errors, 0 crashes\n", iters,
         clean_errors);
  return 0;
}

int main(int argc, char** argv) {
  if (argc == 4 && string(argv[1]) == "--fuzz")
    return run_fuzz((unsigned)atoi(argv[2]), atoi(argv[3]));
  if (argc == 3) return run_cohort(argv[1], argv[2]);
  fprintf(stderr, "usage: %s <vcf> <fasta> | --fuzz <seed> <iters>\n", argv[0]);
  return 2;
}
