/* Sentiric STT Studio (TPU build) — browser workstation.
 *
 * Capabilities mirroring the reference studio/app.js (SURVEY.md §2.1):
 * mic capture → PCM16 WAV assembly, client-side energy VAD for hands-free
 * mode, POST /v1/transcribe with tenant/trace/span headers, client-side
 * speaker re-clustering (threshold 0.94, EMA centroids), client-side
 * hallucination re-filter, karaoke word highlighting, confidence heatmap,
 * emotion-drift alerts, JSON/TXT/SRT export, metrics dashboard polling
 * :15032/metrics, settings persisted in localStorage.
 */
"use strict";

const API = location.origin;
const METRICS_PORT = 15032;

/* ------------------------------------------------ utils */
const $ = (id) => document.getElementById(id);
const uuid = () =>
  "xxxxxxxx".replace(/x/g, () => ((Math.random() * 16) | 0).toString(16)) +
  "-" + Date.now().toString(16);

const HALLUCINATION_PATTERNS = [
  /altyazı/i, /thanks for watching/i, /thank you/i, /abone ol/i,
  /izlediğiniz için/i, /ご視聴/, /^\[.*\]$/, /^\(.*\)$/,
];
function isHallucination(text) {
  const t = text.trim();
  if (t.length < 2) return true;
  return HALLUCINATION_PATTERNS.some((re) => re.test(t));
}

/* ------------------------------------------------ settings (localStorage) */
const Settings = {
  keys: ["opt-lang", "opt-beam", "opt-temp", "opt-diar", "opt-translate", "opt-cluster"],
  load() {
    for (const k of this.keys) {
      const v = localStorage.getItem("sstw." + k);
      if (v === null) continue;
      const el = $(k);
      if (el.type === "checkbox") el.checked = v === "true";
      else el.value = v;
    }
  },
  save() {
    for (const k of this.keys) {
      const el = $(k);
      localStorage.setItem(
        "sstw." + k, el.type === "checkbox" ? el.checked : el.value);
    }
  },
  init() {
    this.load();
    for (const k of this.keys) $(k).addEventListener("change", () => this.save());
  },
};

/* ------------------------------------------------ client-side speaker system */
class SpeakerSystem {
  constructor() { this.centroids = []; this.ema = 0.15; }
  get threshold() { return parseFloat($("opt-cluster").value) || 0.94; }
  cosine(a, b) {
    let d = 0, na = 0, nb = 0;
    for (let i = 0; i < a.length; i++) { d += a[i] * b[i]; na += a[i] * a[i]; nb += b[i] * b[i]; }
    if (!na || !nb) return 0;
    return d / Math.sqrt(na * nb);
  }
  assign(vec) {
    if (!vec || !vec.length) return "";
    let best = -1, bestSim = -1;
    this.centroids.forEach((c, i) => {
      const s = this.cosine(vec, c);
      if (s > bestSim) { bestSim = s; best = i; }
    });
    if (best >= 0 && bestSim >= this.threshold) {
      const c = this.centroids[best];
      for (let i = 0; i < c.length; i++) c[i] = c[i] * (1 - this.ema) + vec[i] * this.ema;
      return "S" + best;
    }
    this.centroids.push(vec.slice());
    return "S" + (this.centroids.length - 1);
  }
  reset() { this.centroids = []; }
}

/* ------------------------------------------------ audio capture */
class AudioSys {
  constructor(onVadUtterance) {
    this.ctx = null; this.stream = null; this.proc = null;
    this.chunks = []; this.recording = false;
    this.handsfree = false; this.vadBuf = []; this.silentFrames = 0;
    this.onVadUtterance = onVadUtterance;
  }
  async start() {
    this.stream = await navigator.mediaDevices.getUserMedia({ audio: true });
    this.ctx = new AudioContext({ sampleRate: 16000 });
    const src = this.ctx.createMediaStreamSource(this.stream);
    this.proc = this.ctx.createScriptProcessor(4096, 1, 1);
    this.proc.onaudioprocess = (e) => this._onAudio(e.inputBuffer.getChannelData(0));
    src.connect(this.proc); this.proc.connect(this.ctx.destination);
    this.recording = true; this.chunks = [];
  }
  _onAudio(f32) {
    const copy = new Float32Array(f32);
    if (this.handsfree) {
      const rms = Math.sqrt(copy.reduce((s, x) => s + x * x, 0) / copy.length);
      if (rms > 0.02) { this.vadBuf.push(copy); this.silentFrames = 0; }
      else if (this.vadBuf.length) {
        this.silentFrames++;
        this.vadBuf.push(copy);
        if (this.silentFrames > 4) {  // ~1 s of silence → utterance done
          const utt = this.vadBuf; this.vadBuf = []; this.silentFrames = 0;
          if (utt.length > 8) this.onVadUtterance(this.toWav(utt));
        }
      }
    } else if (this.recording) this.chunks.push(copy);
  }
  stop() {
    this.recording = false;
    if (this.proc) this.proc.disconnect();
    if (this.stream) this.stream.getTracks().forEach((t) => t.stop());
    if (this.ctx) this.ctx.close();
    const wav = this.toWav(this.chunks);
    this.chunks = [];
    return wav;
  }
  toWav(chunks) {
    const n = chunks.reduce((s, c) => s + c.length, 0);
    const pcm = new Int16Array(n);
    let o = 0;
    for (const c of chunks)
      for (let i = 0; i < c.length; i++)
        pcm[o++] = Math.max(-32768, Math.min(32767, Math.round(c[i] * 32767)));
    const buf = new ArrayBuffer(44 + pcm.length * 2);
    const dv = new DataView(buf);
    const w = (off, s) => { for (let i = 0; i < s.length; i++) dv.setUint8(off + i, s.charCodeAt(i)); };
    w(0, "RIFF"); dv.setUint32(4, 36 + pcm.length * 2, true); w(8, "WAVE");
    w(12, "fmt "); dv.setUint32(16, 16, true); dv.setUint16(20, 1, true);
    dv.setUint16(22, 1, true); dv.setUint32(24, 16000, true);
    dv.setUint32(28, 32000, true); dv.setUint16(32, 2, true); dv.setUint16(34, 16, true);
    w(36, "data"); dv.setUint32(40, pcm.length * 2, true);
    new Int16Array(buf, 44).set(pcm);
    return new Blob([buf], { type: "audio/wav" });
  }
}

/* ------------------------------------------------ transcript UI */
const UI = {
  segments: [],
  speakers: new SpeakerSystem(),
  traceId: uuid(),
  lastEmotion: null,

  async transcribe(blob) {
    $("sys-status").className = "status busy";
    const form = new FormData();
    form.append("file", blob, "audio.wav");
    const lang = $("opt-lang").value.trim();
    if (lang && lang !== "auto") form.append("language", lang);
    if (+$("opt-beam").value > 0) form.append("beam_size", $("opt-beam").value);
    if (+$("opt-temp").value >= 0) form.append("temperature", $("opt-temp").value);
    form.append("diarization", $("opt-diar").checked ? "true" : "false");
    form.append("translate", $("opt-translate").checked ? "true" : "false");
    try {
      const res = await fetch(API + "/v1/transcribe", {
        method: "POST", body: form,
        headers: {
          "X-Tenant-ID": "studio", "X-Trace-ID": this.traceId, "X-Span-ID": uuid(),
        },
      });
      if (!res.ok) throw new Error("HTTP " + res.status);
      const data = await res.json();
      $("player").src = URL.createObjectURL(blob);
      this.addResult(data);
      SystemMonitor.notifyRtf(data.meta);
    } catch (e) {
      this.alert("⚠️ " + e.message, "error");
    } finally {
      $("sys-status").className = "status ok";
    }
  },

  addResult(data) {
    for (const seg of data.segments || []) {
      if (isHallucination(seg.text)) continue;
      seg.client_speaker = this.speakers.assign(seg.speaker_vec || []);
      this.segments.push(seg);
      this.renderSegment(seg);
      this.checkEmotionDrift(seg);
    }
    this.renderKaraoke();
  },

  confClass(p) { return p < 0.5 ? "conf-low" : p < 0.75 ? "conf-mid" : "conf-high"; },

  renderSegment(seg) {
    const div = document.createElement("div");
    div.className = "segment " + this.confClass(seg.probability);
    const who = seg.client_speaker || seg.speaker_id || "";
    div.innerHTML =
      `<span class="time">[${seg.start.toFixed(2)}–${seg.end.toFixed(2)}]</span>` +
      (who ? `<span class="spk spk-${who}">${who}</span>` : "") +
      `<span class="emo emo-${seg.emotion}">${seg.emotion}</span>` +
      `<span class="gender">${seg.gender}</span>` +
      `<span class="text">${seg.text}</span>`;
    $("transcript").appendChild(div);
    div.scrollIntoView({ behavior: "smooth", block: "end" });
  },

  checkEmotionDrift(seg) {
    if (this.lastEmotion && seg.emotion !== this.lastEmotion &&
        (seg.emotion === "angry" || seg.emotion === "sad"))
      this.alert(`🎭 Emotion drift: ${this.lastEmotion} → ${seg.emotion}`, "warn");
    this.lastEmotion = seg.emotion;
  },

  alert(text, cls) {
    const el = document.createElement("div");
    el.className = "alert " + (cls || "");
    el.textContent = text;
    $("alerts").appendChild(el);
    setTimeout(() => el.remove(), 8000);
  },

  /* karaoke word-highlight playback from word timestamps */
  renderKaraoke() {
    const k = $("karaoke");
    k.innerHTML = "";
    for (const seg of this.segments)
      for (const w of seg.words || []) {
        const span = document.createElement("span");
        span.textContent = w.word;
        span.dataset.start = w.start; span.dataset.end = w.end;
        span.className = this.confClass(w.probability);
        k.appendChild(span);
      }
  },
  tickKaraoke(tsec) {
    for (const span of $("karaoke").children) {
      const on = tsec >= +span.dataset.start && tsec <= +span.dataset.end;
      span.classList.toggle("active", on);
    }
  },

  /* exports */
  download(name, text, mime) {
    const a = document.createElement("a");
    a.href = URL.createObjectURL(new Blob([text], { type: mime }));
    a.download = name; a.click();
  },
  exportJSON() { this.download("transcript.json", JSON.stringify(this.segments, null, 2), "application/json"); },
  exportTXT() { this.download("transcript.txt", this.segments.map((s) => s.text).join("\n"), "text/plain"); },
  exportSRT() {
    const ts = (t) => {
      const h = String(Math.floor(t / 3600)).padStart(2, "0");
      const m = String(Math.floor((t % 3600) / 60)).padStart(2, "0");
      const s = String(Math.floor(t % 60)).padStart(2, "0");
      const ms = String(Math.round((t % 1) * 1000)).padStart(3, "0");
      return `${h}:${m}:${s},${ms}`;
    };
    const srt = this.segments.map((s, i) =>
      `${i + 1}\n${ts(s.start)} --> ${ts(s.end)}\n${s.text}\n`).join("\n");
    this.download("transcript.srt", srt, "text/plain");
  },
  clear() {
    this.segments = []; this.speakers.reset(); this.lastEmotion = null;
    $("transcript").innerHTML = ""; $("karaoke").innerHTML = "";
  },
};

/* ------------------------------------------------ metrics dashboard */
const SystemMonitor = {
  prev: null,
  async poll() {
    try {
      const res = await fetch(`${location.protocol}//${location.hostname}:${METRICS_PORT}/metrics`);
      const text = await res.text();
      const get = (name) => {
        const m = text.match(new RegExp(`^${name}(?:_total)?(?:\\{[^}]*\\})? ([0-9.e+]+)$`, "m"));
        return m ? parseFloat(m[1]) : 0;
      };
      const now = Date.now() / 1000;
      const cur = {
        t: now,
        requests: get("stt_requests"),
        audio: get("stt_audio_seconds_processed"),
        tokens: get("stt_tokens_generated"),
      };
      $("m-requests").textContent = cur.requests;
      $("m-audio").textContent = cur.audio.toFixed(1);
      $("m-tokens").textContent = cur.tokens;
      if (this.prev && cur.t > this.prev.t) {
        const tps = (cur.tokens - this.prev.tokens) / (cur.t - this.prev.t);
        $("m-tps").textContent = tps.toFixed(1);
      }
      this.prev = cur;
      $("sys-status").classList.add("ok");
    } catch {
      $("sys-status").classList.remove("ok");
    }
  },
  notifyRtf(meta) {
    if (meta && meta.rtf > 0) $("m-rtfx").textContent = (1 / meta.rtf).toFixed(1) + "×";
  },
  init() { this.poll(); setInterval(() => this.poll(), 60000); },
};

/* ------------------------------------------------ wiring */
const audio = new AudioSys((blob) => UI.transcribe(blob));

$("btn-record").addEventListener("click", async () => {
  const btn = $("btn-record");
  if (!audio.recording) {
    await audio.start();
    btn.textContent = "⏹ Stop"; btn.classList.add("recording");
  } else {
    const wav = audio.stop();
    btn.textContent = "🎙 Record"; btn.classList.remove("recording");
    if (wav.size > 44) UI.transcribe(wav);
  }
});

$("btn-handsfree").addEventListener("click", async () => {
  const btn = $("btn-handsfree");
  if (!audio.handsfree) {
    await audio.start(); audio.handsfree = true;
    btn.classList.add("recording"); btn.textContent = "🤖 Listening…";
  } else {
    audio.handsfree = false; audio.stop();
    btn.classList.remove("recording"); btn.textContent = "🤖 Hands-free";
  }
});

$("file-input").addEventListener("change", (e) => {
  if (e.target.files[0]) {
    $("player").src = URL.createObjectURL(e.target.files[0]);
    UI.transcribe(e.target.files[0]);
  }
});

$("player").addEventListener("timeupdate", (e) => UI.tickKaraoke(e.target.currentTime));
$("exp-json").addEventListener("click", () => UI.exportJSON());
$("exp-txt").addEventListener("click", () => UI.exportTXT());
$("exp-srt").addEventListener("click", () => UI.exportSRT());
$("btn-clear").addEventListener("click", () => UI.clear());

Settings.init();
SystemMonitor.init();
