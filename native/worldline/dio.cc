// worldline: native f0 extraction for knnsvc_tpu — the FAST production
// extractor (the parity-grade Harvest lives in native/harvest/harvest.cc).
//
// Clean-room implementation of the DIO pitch estimator (Morise, Kawahara,
// Katayose 2009: "Fast and reliable F0 estimation method based on the period
// extraction of vocal fold vibration of singing voice and speech") with
// instantaneous-frequency refinement (StoneMask, Morise 2015) — the same
// algorithm family the reference reaches through pyworld
// (ref hifigan/knn_data_cnpop.py:275-286 uses pw.dio; ddsp_prematch_dataset.py
// :121-128 uses pw.harvest). Implemented from the published algorithms, not
// ported from the WORLD sources.
//
// Pipeline per channel (log-spaced boundary frequencies, 4/octave):
//   1. materialize the signal band-limited around the boundary at a
//      DECIMATED rate (band.h spectral truncation) and apply a
//      Nuttall-windowed low-pass FIR at that rate,
//   2. measure four event-interval sequences (rising/falling zero crossings,
//      peaks, dips) and convert interval lengths to instantaneous f0,
//   3. interpolate each sequence to the frame times; candidate = mean of 4,
//      reliability = stddev of 4.
// The per-frame candidate sets from all channels feed a Viterbi pass
// (local cost = estimator deviation, transition = log-pitch continuity +
// a voicing-toggle penalty) that picks a temporally consistent track —
// fixing the octave flips and onset glitches a per-frame argmin commits
// to. A jump-removal pass cleans residue, then refinement sharpens each
// voiced frame from the instantaneous frequency of the fundamental and its
// 2nd harmonic.
//
// The whole pass runs on an ~8 kHz decimated copy of the input; with the
// per-channel decimation this is >500x realtime on one core.
//
// C API at the bottom (ctypes-friendly, see knnsvc_tpu/dsp/harvest.py).

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

#include "band.h"
#include "fft.h"

namespace worldline {
namespace {

constexpr double kTargetFs = 8000.0;
constexpr double kChannelOversample = 3.5;  // band rate / boundary f0

struct Candidate {
  std::vector<double> f0;   // per frame
  std::vector<double> dev;  // relative deviation per frame
};

Candidate channel_candidate(const SignalSpectrum& spec, double boundary_f0,
                            const std::vector<double>& frame_times,
                            double f0_floor, double f0_ceil, BandCache* cache) {
  BandSignal band = decimated_signal_cached(spec, boundary_f0,
                                            kChannelOversample, cache);
  fir_filter(&band.y, lowpass_kernel(boundary_f0, band.rate));

  Events e[4];
  all_interval_events(band.y, band.rate, e);

  std::vector<double> f1, f2, f3, f4;
  interp_to_frames(e[0], frame_times, &f1);
  interp_to_frames(e[1], frame_times, &f2);
  interp_to_frames(e[2], frame_times, &f3);
  interp_to_frames(e[3], frame_times, &f4);

  Candidate c;
  const size_t nf = frame_times.size();
  c.f0.assign(nf, 0.0);
  c.dev.assign(nf, 1e9);
  for (size_t i = 0; i < nf; ++i) {
    const double v[4] = {f1[i], f2[i], f3[i], f4[i]};
    double mean = 0.0;
    bool ok = true;
    for (double x : v) {
      if (x <= 0.0) ok = false;
      mean += x;
    }
    if (!ok) continue;
    mean *= 0.25;
    // the channel only trusts f0 near its boundary band
    if (mean < boundary_f0 / 2.0 || mean > boundary_f0 * 2.0 ||
        mean < f0_floor || mean > f0_ceil)
      continue;
    double var = 0.0;
    for (double x : v) var += (x - mean) * (x - mean);
    const double sd = std::sqrt(var / 3.0);
    c.f0[i] = mean;
    c.dev[i] = sd / std::max(mean, 1e-12);
  }
  return c;
}

// Remove frames whose f0 jumps more than 20% vs either neighbour (octave
// glitch / boundary artifacts), then drop too-short voiced runs.
void fix_contour(std::vector<double>* f0p) {
  std::vector<double>& f0 = *f0p;
  const int n = static_cast<int>(f0.size());
  std::vector<double> out = f0;
  const double kJump = 0.2;
  for (int i = 1; i < n - 1; ++i) {
    if (f0[i] == 0.0) continue;
    const bool left_ok = f0[i - 1] > 0.0 &&
        std::fabs(f0[i] - f0[i - 1]) / f0[i] < kJump;
    const bool right_ok = f0[i + 1] > 0.0 &&
        std::fabs(f0[i] - f0[i + 1]) / f0[i] < kJump;
    if (!left_ok && !right_ok) out[i] = 0.0;
  }
  // drop voiced runs shorter than 3 frames
  int run_start = -1;
  for (int i = 0; i <= n; ++i) {
    const bool voiced = i < n && out[i] > 0.0;
    if (voiced && run_start < 0) run_start = i;
    if (!voiced && run_start >= 0) {
      if (i - run_start < 3) {
        for (int j = run_start; j < i; ++j) out[j] = 0.0;
      }
      run_start = -1;
    }
  }
  f0 = out;
}

}  // namespace

void dio_f0(const double* x_in, int n_in, int fs_in, double frame_period_ms,
            double f0_floor, double f0_ceil, int channels_in_octave,
            double dev_threshold, double* f0_out, int n_frames) {
  const int factor = std::max(1, static_cast<int>(std::round(fs_in / kTargetFs)));
  std::vector<double> x = decimate_signal(x_in, n_in, factor, fs_in);
  const int fs = fs_in / factor;
  const int n = static_cast<int>(x.size());
  const double ceil_eff = std::min(f0_ceil, 0.5 * fs - 1.0);

  const std::vector<double> frame_times = [&] {
    std::vector<double> t(n_frames);
    for (int i = 0; i < n_frames; ++i) t[i] = i * frame_period_ms / 1000.0;
    return t;
  }();

  const SignalSpectrum spec = make_spectrum(x.data(), n, fs, f0_floor);

  const int n_bands = static_cast<int>(
      std::ceil(std::log2(ceil_eff / f0_floor) * channels_in_octave)) + 1;
  BandCache band_cache;

  // collect the candidate set per frame across all channels
  std::vector<std::vector<std::pair<double, double>>> cands(n_frames);  // (f0, dev)
  for (int b = 0; b < n_bands; ++b) {
    const double boundary =
        f0_floor * std::pow(2.0, static_cast<double>(b + 1) / channels_in_octave);
    Candidate c = channel_candidate(spec, boundary, frame_times,
                                    f0_floor, ceil_eff, &band_cache);
    for (int i = 0; i < n_frames; ++i) {
      if (c.f0[i] > 0.0) cands[i].emplace_back(c.f0[i], c.dev[i]);
    }
  }

  // Viterbi over per-frame candidates (+ an explicit unvoiced state):
  // local cost = candidate deviation (unvoiced costs dev_threshold, so a
  // frame goes unvoiced when every candidate is less reliable than that);
  // transition cost = lambda * |log2 ratio| between voiced states and a
  // fixed toggle penalty for voiced<->unvoiced — the continuity term fixes
  // the octave flips and onset glitches a per-frame argmin commits to.
  const double kLambda = 0.5;
  const double kToggle = 0.08;
  std::vector<std::vector<double>> cost(n_frames);
  std::vector<std::vector<int>> back(n_frames);
  for (int i = 0; i < n_frames; ++i) {
    const int m = static_cast<int>(cands[i].size());
    cost[i].assign(m + 1, 0.0);  // slot m = unvoiced
    back[i].assign(m + 1, 0);
    for (int j = 0; j < m; ++j) cost[i][j] = std::min(cands[i][j].second, 1.0);
    cost[i][m] = dev_threshold;
    if (i == 0) continue;
    const int pm = static_cast<int>(cands[i - 1].size());
    for (int j = 0; j <= m; ++j) {
      double best = 1e18;
      int arg = 0;
      for (int pj = 0; pj <= pm; ++pj) {
        double trans;
        const bool v_now = j < m, v_prev = pj < pm;
        if (v_now && v_prev) {
          trans = kLambda * std::fabs(std::log2(cands[i][j].first /
                                                cands[i - 1][pj].first));
        } else if (v_now != v_prev) {
          trans = kToggle;
        } else {
          trans = 0.0;
        }
        const double total = cost[i - 1][pj] + trans;
        if (total < best) {
          best = total;
          arg = pj;
        }
      }
      cost[i][j] += best;
      back[i][j] = arg;
    }
  }

  std::vector<double> best_f0(n_frames, 0.0);
  {
    const auto& last = cost[n_frames - 1];
    int j = static_cast<int>(
        std::min_element(last.begin(), last.end()) - last.begin());
    for (int i = n_frames - 1; i >= 0; --i) {
      const int m = static_cast<int>(cands[i].size());
      best_f0[i] = (j < m) ? cands[i][j].first : 0.0;
      if (i > 0) j = back[i][j];
    }
  }
  fix_contour(&best_f0);

  for (int i = 0; i < n_frames; ++i) {
    // 6-period window: negative-frequency leakage of the single-bin DFT
    // falls off fast with window length (a 3-period window biases a pure
    // 220 Hz tone ~15 cents flat)
    const Refined r = refine_f0(x.data(), n, fs, frame_times[i], best_f0[i],
                                f0_floor, ceil_eff, /*max_harmonics=*/2,
                                /*iterations=*/2, /*window_periods=*/3.0);
    f0_out[i] = r.f0;
  }
}

extern "C" {

// Returns the number of frames for a given signal length (pyworld layout:
// n/  (fs*period) + 1).
int worldline_n_frames(int n, int fs, double frame_period_ms) {
  return static_cast<int>(
             1000.0 * n / fs / frame_period_ms) + 1;
}

// DIO + StoneMask-style refinement. f0_out must hold worldline_n_frames(...)
// doubles. channels_in_octave/dev_threshold <= 0 pick the defaults (4, 0.1).
// Returns 0 on success.
int worldline_dio(const double* x, int n, int fs, double frame_period_ms,
                  double f0_floor, double f0_ceil, int channels_in_octave,
                  double dev_threshold, double* f0_out) {
  if (n <= 0 || fs <= 0 || frame_period_ms <= 0.0) return 1;
  // 3/octave: same accuracy as 4 on the sidecar oracle, ~1.4x faster
  if (channels_in_octave <= 0) channels_in_octave = 3;
  if (dev_threshold <= 0.0) dev_threshold = 0.1;
  const int n_frames = worldline_n_frames(n, fs, frame_period_ms);
  worldline::dio_f0(x, n, fs, frame_period_ms, f0_floor, f0_ceil,
                    channels_in_octave, dev_threshold, f0_out, n_frames);
  return 0;
}

}  // extern "C"

}  // namespace worldline
