// worldline: native f0 extraction for knnsvc_tpu.
//
// Clean-room implementation of the DIO pitch estimator (Morise, Kawahara,
// Katayose 2009: "Fast and reliable F0 estimation method based on the period
// extraction of vocal fold vibration of singing voice and speech") with
// StoneMask instantaneous-frequency refinement (Morise 2015) — the same
// algorithm family the reference reaches through pyworld
// (ref hifigan/knn_data_cnpop.py:275-286 uses pw.dio; ddsp_prematch_dataset.py
// :121-128 uses pw.harvest). Implemented from the published algorithm, not
// ported from the WORLD sources.
//
// Pipeline per channel (log-spaced boundary frequencies, 2/octave):
//   1. band-limit the signal around the boundary with an FFT-domain
//      Nuttall-windowed low-pass (+ DC removal),
//   2. measure four event-interval sequences (rising/falling zero crossings,
//      peaks, dips) and convert interval lengths to instantaneous f0,
//   3. interpolate each sequence to the frame times; candidate = mean of 4,
//      reliability = stddev of 4.
// The per-frame candidate sets from all channels feed a Viterbi pass
// (local cost = estimator deviation, transition = log-pitch continuity +
// a voicing-toggle penalty) that picks a temporally consistent track —
// fixing the octave flips and onset glitches a per-frame argmin commits
// to. A jump-removal pass cleans residue, then StoneMask-style refinement
// sharpens each voiced frame from the instantaneous frequency of the
// fundamental and its 2nd harmonic.
//
// C API at the bottom (ctypes-friendly, see knnsvc_tpu/dsp/harvest.py).

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

#include "fft.h"

namespace worldline {
namespace {

struct Events {
  std::vector<double> times;  // event midpoint times (s)
  std::vector<double> f0;     // 1 / interval (Hz)
};

// Nuttall window (continuous first derivative variant).
double nuttall(double x) {  // x in [0, 1]
  const double a0 = 0.355768, a1 = 0.487396, a2 = 0.144232, a3 = 0.012604;
  return a0 - a1 * std::cos(2.0 * M_PI * x) + a2 * std::cos(4.0 * M_PI * x) -
         a3 * std::cos(6.0 * M_PI * x);
}

// Band-limit x around boundary_f0: FFT -> multiply by the transform of a
// Nuttall-windowed low-pass of length ~ 4 periods -> IFFT. Also removes DC.
std::vector<double> filtered_signal(const std::vector<cplx>& spectrum_fft,
                                    size_t nfft, int n, int fs,
                                    double boundary_f0) {
  const int half_filter = static_cast<int>(std::round(fs / boundary_f0 * 2.0));
    std::vector<cplx> kernel(nfft, cplx(0.0, 0.0));
  const double omega = 2.0 * M_PI * boundary_f0 / fs;
  double dc = 0.0;
  for (int i = -half_filter; i <= half_filter; ++i) {
    const double w = nuttall(0.5 + 0.5 * static_cast<double>(i) / half_filter);
    const double sinc = (i == 0) ? omega / M_PI
                                 : std::sin(omega * i) / (M_PI * i);
    const double v = w * sinc;
    dc += v;
    kernel[(i + static_cast<int>(nfft)) % nfft] = cplx(v, 0.0);
  }
  fft(kernel, false);
  std::vector<cplx> prod(nfft);
  for (size_t i = 0; i < nfft; ++i) prod[i] = spectrum_fft[i] * kernel[i];
  // remove DC so zero crossings are meaningful
  prod[0] = cplx(0.0, 0.0);
  fft(prod, true);
  std::vector<double> out(n);
  for (int i = 0; i < n; ++i) out[i] = prod[i].real() / std::max(dc, 1e-12);
  return out;
}

// Zero-crossing events with linear sub-sample interpolation. rising=true
// detects -..+ crossings on y, which together with sign flips / negation
// yields all four event families.
Events interval_events(const std::vector<double>& y, int fs, bool rising) {
  Events ev;
  std::vector<double> cross;
  const int n = static_cast<int>(y.size());
  for (int i = 0; i < n - 1; ++i) {
    const double a = rising ? y[i] : -y[i];
    const double b = rising ? y[i + 1] : -y[i + 1];
    if (a < 0.0 && b >= 0.0) {
      const double frac = a / (a - b);
      cross.push_back((i + frac) / fs);
    }
  }
  for (size_t i = 0; i + 1 < cross.size(); ++i) {
    const double interval = cross[i + 1] - cross[i];
    if (interval <= 0.0) continue;
    ev.times.push_back(0.5 * (cross[i] + cross[i + 1]));
    ev.f0.push_back(1.0 / interval);
  }
  return ev;
}

// Peaks/dips: zero crossings of the first difference.
Events extremum_events(const std::vector<double>& y, int fs, bool peaks) {
  std::vector<double> dy(y.size() - 1);
  for (size_t i = 0; i + 1 < y.size(); ++i) dy[i] = y[i + 1] - y[i];
  return interval_events(dy, fs, /*rising=*/!peaks);
}

// Linear interpolation of (times, values) onto frame times; out-of-range -> 0.
void interp_to_frames(const Events& ev, const std::vector<double>& frame_times,
                      std::vector<double>* out) {
  const size_t m = ev.times.size();
  out->assign(frame_times.size(), 0.0);
  if (m < 2) return;
  size_t j = 0;
  for (size_t i = 0; i < frame_times.size(); ++i) {
    const double t = frame_times[i];
    if (t < ev.times.front() || t > ev.times.back()) continue;
    while (j + 2 < m && ev.times[j + 1] < t) ++j;
    const double t0 = ev.times[j], t1 = ev.times[j + 1];
    const double f0a = ev.f0[j], f0b = ev.f0[j + 1];
    const double w = (t1 > t0) ? (t - t0) / (t1 - t0) : 0.0;
    (*out)[i] = f0a + w * (f0b - f0a);
  }
}

struct Candidate {
  std::vector<double> f0;   // per frame
  std::vector<double> dev;  // relative deviation per frame
};

Candidate channel_candidate(const std::vector<cplx>& spec, size_t nfft, int n,
                            int fs, double boundary_f0,
                            const std::vector<double>& frame_times,
                            double f0_floor, double f0_ceil) {
  const std::vector<double> y = filtered_signal(spec, nfft, n, fs, boundary_f0);
  Events e1 = interval_events(y, fs, true);
  Events e2 = interval_events(y, fs, false);
  Events e3 = extremum_events(y, fs, true);
  Events e4 = extremum_events(y, fs, false);

  std::vector<double> f1, f2, f3, f4;
  interp_to_frames(e1, frame_times, &f1);
  interp_to_frames(e2, frame_times, &f2);
  interp_to_frames(e3, frame_times, &f3);
  interp_to_frames(e4, frame_times, &f4);

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

// Single-bin DFT of a Nuttall-windowed frame centered at `center`, evaluated
// at exact frequency `freq`, with the signal offset by `shift` samples.
cplx windowed_dft_at(const double* x, int n, int fs, int center,
                     int half_window, double freq, int shift) {
  cplx acc(0.0, 0.0);
  const double omega = 2.0 * M_PI * freq / fs;
  for (int i = -half_window; i <= half_window; ++i) {
    const int idx = center + i + shift;
    const double s = (idx >= 0 && idx < n) ? x[idx] : 0.0;
    const double w = nuttall(0.5 + 0.5 * static_cast<double>(i) / half_window);
    acc += cplx(s * w, 0.0) * cplx(std::cos(omega * i), -std::sin(omega * i));
  }
  return acc;
}

// StoneMask-style refinement: instantaneous frequency at the candidate and
// its 2nd harmonic from the one-sample phase advance of a single-bin DFT
// (angle(S(+1) * conj(S)) * fs / 2pi == the dominant frequency inside the
// bin), magnitude-weighted, iterated twice. Window = 3 periods.
double refine_frame(const double* x, int n, int fs, double t, double f0,
                    double f0_floor, double f0_ceil) {
  if (f0 <= 0.0) return 0.0;
  const int center = static_cast<int>(std::round(t * fs));
  double est = f0;
  for (int iter = 0; iter < 2; ++iter) {
    // 6-period window: negative-frequency leakage of the single-bin DFT
    // falls off fast with window length (a 3-period window biases a pure
    // 220 Hz tone ~15 cents flat)
    const int half_window =
        static_cast<int>(std::round(3.0 * fs / est)) + 1;
    double num = 0.0, den = 0.0;
    for (int harmonic = 1; harmonic <= 2; ++harmonic) {
      const double target = est * harmonic;
      if (target >= fs / 2.0) break;
      const cplx s0 = windowed_dft_at(x, n, fs, center, half_window, target, 0);
      const cplx s1 = windowed_dft_at(x, n, fs, center, half_window, target, 1);
      const double mag = std::abs(s0);
      if (mag < 1e-12) continue;
      const double inst = std::arg(s1 * std::conj(s0)) * fs / (2.0 * M_PI);
      if (inst <= 0.0) continue;
      num += mag * inst / harmonic;
      den += mag;
    }
    if (den < 1e-12) return est;
    double refined = num / den;
    if (std::fabs(refined - est) / est > 0.2) return est;  // keep sane
    est = refined;
  }
  if (est < f0_floor || est > f0_ceil) return 0.0;
  return est;
}

}  // namespace

void dio_f0(const double* x_in, int n, int fs, double frame_period_ms,
            double f0_floor, double f0_ceil, int channels_in_octave,
            double dev_threshold, double* f0_out, int n_frames) {
  std::vector<double> x(x_in, x_in + n);

  const std::vector<double> frame_times = [&] {
    std::vector<double> t(n_frames);
    for (int i = 0; i < n_frames; ++i) t[i] = i * frame_period_ms / 1000.0;
    return t;
  }();

  // FFT of the (zero-padded) signal, computed once.
  const size_t nfft = next_pow2(static_cast<size_t>(n) +
                                static_cast<size_t>(fs / f0_floor * 4) + 2);
  std::vector<cplx> spec(nfft, cplx(0.0, 0.0));
  for (int i = 0; i < n; ++i) spec[i] = cplx(x[i], 0.0);
  fft(spec, false);

  const int n_bands = static_cast<int>(
      std::ceil(std::log2(f0_ceil / f0_floor) * channels_in_octave)) + 1;

  // collect the candidate set per frame across all channels
  std::vector<std::vector<std::pair<double, double>>> cands(n_frames);  // (f0, dev)
  for (int b = 0; b < n_bands; ++b) {
    const double boundary =
        f0_floor * std::pow(2.0, static_cast<double>(b + 1) / channels_in_octave);
    Candidate c = channel_candidate(spec, nfft, n, fs, boundary, frame_times,
                                    f0_floor, f0_ceil);
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
    f0_out[i] = refine_frame(x.data(), n, fs, frame_times[i], best_f0[i],
                             f0_floor, f0_ceil);
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
  if (channels_in_octave <= 0) channels_in_octave = 4;
  if (dev_threshold <= 0.0) dev_threshold = 0.1;
  const int n_frames = worldline_n_frames(n, fs, frame_period_ms);
  worldline::dio_f0(x, n, fs, frame_period_ms, f0_floor, f0_ceil,
                    channels_in_octave, dev_threshold, f0_out, n_frames);
  return 0;
}

}  // extern "C"

}  // namespace worldline
